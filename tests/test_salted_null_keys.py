"""NULL partition keys through the salted family (r12 fix).

A plain ``Window.partitionBy(key)`` groups NULL keys into one regular
partition; the salted forms must do the same.  They almost did — the
fragment/carry machinery is groupBy+window+union (NULL-safe by
construction) — except salted_rank's offsets JOIN, a plain equi-join
that silently DROPPED every NULL-key row (found by direct probe, not
by any gate: every committed corpus has non-null user_id).  Now a
null-safe join; these tests pin plain/salted parity on NULL-key data
for every family member so the hole can't reopen.

Semantics note (why NULL keys are in-contract at all): a 100 TB event
log WILL contain anonymous/unattributed rows; "NULL is one key"
matches the plain window the operators replace.  The as-of ORACLE
divergence (DuckDB's join-based ASOF treats NULL as no-match, window
semantics group it) is exactly why the committed corpora keep user_id
non-null — the operator contract here is the window semantics.
"""

import datetime
import random

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators.relational import (
    salted_moving_agg,
    salted_next,
    salted_prev,
    salted_rank,
    salted_suffix_min,
)
from sec_edgar_spark.operators.sessionize import salted_sessionize


@pytest.fixture(scope="module")
def nulled(spark):
    random.seed(13)
    rows = []
    for i in range(1200):
        u = random.choice([1, 2, 3, None, None])
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
            seconds=random.randint(0, 20 * 86400)
        )
        rows.append(
            (i, ts, u, random.choice(["a", "b"]), float(i % 11))
        )
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    ).cache()


def _pdf(df):
    return (
        df.toPandas()
        .sort_values(by=list(df.columns))
        .reset_index(drop=True)
    )


def _assert_pair(got, want, n_rows):
    assert got.count() == want.count()
    assert _pdf(got).equals(_pdf(want))
    if n_rows is not None:
        assert got.count() == n_rows  # nothing dropped


def test_rank_null_keys(nulled):
    _assert_pair(
        salted_rank(nulled, "user_id", "ts", ["event_id"],
                    bucket_s=6 * 3600, out_col="rk"),
        salted_rank(nulled, "user_id", "ts", ["event_id"],
                    bucket_s=None, out_col="rk"),
        nulled.count(),
    )


def test_rank_null_multi_key(nulled):
    df = nulled.withColumn(
        "k2", F.when(F.col("event_id") % 3 == 0, F.col("event_type"))
    )
    _assert_pair(
        salted_rank(df, ["user_id", "k2"], "ts", ["event_id"],
                    bucket_s=6 * 3600, out_col="rk"),
        salted_rank(df, ["user_id", "k2"], "ts", ["event_id"],
                    bucket_s=None, out_col="rk"),
        df.count(),
    )


def test_prev_next_null_keys(nulled):
    for fn in (salted_prev, salted_next):
        _assert_pair(
            fn(nulled, "user_id", "ts", ["event_id"],
               ["event_type", "value"], bucket_s=6 * 3600),
            fn(nulled, "user_id", "ts", ["event_id"],
               ["event_type", "value"], bucket_s=None),
            nulled.count(),
        )


def test_suffix_min_null_keys(nulled):
    d = nulled.withColumn(
        "_v", F.when(F.col("event_type") == "a", F.col("value"))
    )
    _assert_pair(
        salted_suffix_min(d, "user_id", "ts", ["event_id"], "_v",
                          "sfx", bucket_s=6 * 3600),
        salted_suffix_min(d, "user_id", "ts", ["event_id"], "_v",
                          "sfx", bucket_s=None),
        d.count(),
    )


def test_moving_agg_null_keys(nulled):
    aggs = {"mv": ("value", "avg"), "cnt": ("*", "count")}
    _assert_pair(
        salted_moving_agg(nulled, "user_id", "ts", ["event_id"], aggs,
                          frame_rows=4, bucket_s=6 * 3600,
                          block_rows=16),
        salted_moving_agg(nulled, "user_id", "ts", ["event_id"], aggs,
                          frame_rows=4, bucket_s=None),
        nulled.count(),
    )


def test_asof_null_keys(nulled):
    """As-of: NULL keys take WINDOW semantics (group like a key) in
    BOTH forms — documented divergence from join-based ASOF, pinned."""
    from sec_edgar_spark.operators.asof import asof_join

    L = nulled.filter("event_type = 'a'").select(
        "event_id", "ts", "user_id", "value"
    )
    R = nulled.filter("event_type = 'b'").select(
        "event_id", "ts", "user_id", "value"
    )
    kw = dict(on="user_id", left_ts="ts", right_ts="ts",
              right_cols=["event_id", "value", "ts"], suffix="_e")
    got = asof_join(L, R, bucket_s=3600, **kw)
    want = asof_join(L, R, bucket_s=None, **kw)
    assert _pdf(got).equals(_pdf(want))
    assert got.count() == L.count()  # left-outer: nothing dropped
    # NULL-key lefts DO match NULL-key rights (window semantics)
    assert (
        got.filter(F.col("user_id").isNull())
        .filter(F.col("event_id_e").isNotNull())
        .count()
        > 0
    )


def test_capped_recent_join_null_keys(nulled):
    """The interval family keeps JOIN semantics for NULL keys (no
    pairs) — consistent with its uncapped range-join twin and the SQL
    oracles; pinned so the two families' contracts stay explicit."""
    from sec_edgar_spark.operators.interval import capped_recent_join

    L = nulled.filter("event_type = 'a'").select(
        "event_id", "user_id", "ts"
    )
    R = nulled.filter("event_type = 'b'").select(
        "user_id",
        F.col("ts").alias("touch_ts"),
        F.col("event_id").alias("t_eid"),
    )
    out = capped_recent_join(
        L, R, on="user_id", left_ts="ts", right_ts="touch_ts",
        right_id="t_eid", k=5, tolerance="7 DAYS", bucket_s=3600,
    )
    assert out.filter(F.col("user_id").isNull()).count() == 0
    assert out.count() > 0


def test_sessionize_null_keys(nulled):
    got = salted_sessionize(nulled, gap_s=1800, bucket_s=6 * 3600)
    want = salted_sessionize(nulled, gap_s=1800, bucket_s=None)
    assert _pdf(got).equals(_pdf(want))
    # the NULL user's events all sessionized (one NULL key group)
    n_null_events = nulled.filter(F.col("user_id").isNull()).count()
    assert (
        got.filter(F.col("user_id").isNull())
        .agg(F.sum("n_events"))
        .first()[0]
        == n_null_events
    )
