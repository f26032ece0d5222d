"""salted_rank (operators/relational.py): exact equality with the
single-window ``row_number().over(partitionBy(key).orderBy(ts, id))``
form, including the traps the time-bucket split could get wrong —
ranks spanning many buckets, boundary-exact timestamps, equal
timestamps (same bucket by construction), keys absent from whole
buckets — plus the plan contract that makes it the hot-key-safe form."""

import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from sec_edgar_spark.operators.relational import salted_rank

BASE = 1_700_000_000
BUCKET = 3600


def _ts(off):
    return datetime.datetime.utcfromtimestamp(BASE + off)


def _classic(df):
    w = Window.partitionBy("key").orderBy("ts", "rid")
    return df.withColumn("_rk", F.row_number().over(w))


def _assert_equal(spark, rows, bucket_s=BUCKET):
    df = spark.createDataFrame(rows, "rid long, key long, ts timestamp")
    cols = ["key", "rid", "ts", "_rk"]
    got = sorted(
        map(tuple, salted_rank(df, "key", "ts", ["rid"], bucket_s=bucket_s)
            .select(cols).collect())
    )
    want = sorted(map(tuple, _classic(df).select(cols).collect()))
    assert got == want and got


def test_ranks_span_many_buckets(spark):
    """One key active every 10 min for 12 h: ranks must run 1..73
    across twelve 1 h buckets with correct per-bucket offsets."""
    rows = [(i, 1, _ts(i * 600)) for i in range(73)]
    _assert_equal(spark, rows)


def test_bucket_boundary_exact_timestamps(spark):
    """Rows AT bucket edges (off % bucket == 0) belong to the upper
    bucket; the offset chain must still count them exactly once."""
    rows = [
        (1, 1, _ts(0)),
        (2, 1, _ts(BUCKET - 1)),
        (3, 1, _ts(BUCKET)),      # exactly on the edge
        (4, 1, _ts(BUCKET + 1)),
        (5, 1, _ts(2 * BUCKET)),  # next edge
    ]
    _assert_equal(spark, rows)


def test_equal_timestamps_tiebreak_within_bucket(spark):
    """Equal timestamps always share a bucket, so the id tiebreak is
    purely local — rank order must match the single-window form."""
    rows = [(9, 1, _ts(5)), (3, 1, _ts(5)), (7, 1, _ts(5)), (1, 2, _ts(5))]
    _assert_equal(spark, rows)


def test_key_skips_whole_buckets(spark):
    rows = [
        (1, 1, _ts(10)),
        (2, 1, _ts(5 * BUCKET + 10)),  # silent for 4 buckets
        (3, 2, _ts(2 * BUCKET)),
        (4, 2, _ts(2 * BUCKET + 1)),
    ]
    _assert_equal(spark, rows)


def test_bucket_s_must_be_positive(spark):
    df = spark.createDataFrame([], "rid long, key long, ts timestamp")
    with pytest.raises(ValueError, match="bucket_s must be >= 1"):
        salted_rank(df, "key", "ts", ["rid"], bucket_s=0)


def test_rank_dtype_matches_row_number(spark):
    df = spark.createDataFrame([(1, 1, _ts(0))], "rid long, key long, ts timestamp")
    out = salted_rank(df, "key", "ts", ["rid"])
    assert dict(out.dtypes)["_rk"] == "int"


def test_event_window_is_bucket_salted(spark):
    """Plan contract: the row-level window partitions by
    (key, _srk_bkt), never by key alone — the whole point."""
    df = spark.createDataFrame([(1, 1, _ts(0))], "rid long, key long, ts timestamp")
    plan = (
        salted_rank(df, "key", "ts", ["rid"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    row_windows = [
        ln for ln in plan.splitlines() if "windowspecdefinition(key" in ln
    ]
    assert row_windows, plan
    for ln in row_windows:
        # the only key-partitioned windows are the row_number over
        # (key, bucket) and the offsets cumsum over bucket summaries
        assert "_srk_bkt" in ln, ln


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 40_000)),
        min_size=1,
        max_size=60,
    ),
    bucket_s=st.integers(1, 7200),
)
def test_salted_rank_equals_single_window(spark, rows, bucket_s):
    """Property equality on random streams and random bucket widths
    (down to 1 s buckets — one bucket per event timestamp)."""
    data = [(i, u, _ts(off)) for i, (u, off) in enumerate(rows)]
    _assert_equal(spark, data, bucket_s=bucket_s)


# ---- salted_suffix_min: the funnel next-match device ----


def _classic_suffix_min(df):
    w = (
        Window.partitionBy("key")
        .orderBy(F.desc("ts"), F.desc("rid"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn("nxt", F.min("val").over(w))


def _assert_suffix_equal(spark, rows, bucket_s=BUCKET):
    from sec_edgar_spark.operators.relational import salted_suffix_min

    df = spark.createDataFrame(
        rows, "rid long, key long, ts timestamp, val timestamp"
    )
    cols = ["key", "rid", "ts", "val", "nxt"]
    got = sorted(
        map(
            tuple,
            salted_suffix_min(
                df, "key", "ts", ["rid"], "val", "nxt", bucket_s=bucket_s
            ).select(cols).collect(),
        )
    )
    want = sorted(map(tuple, _classic_suffix_min(df).select(cols).collect()))
    assert got == want and got


def test_suffix_min_carry_across_buckets_and_ties(spark):
    """Values only in much-later buckets must carry back; equal
    timestamps resolve by the id tiebreak exactly like the single
    window (same-ts larger-id rows are 'strictly after')."""
    rows = [
        (1, 1, _ts(10), None),
        (2, 1, _ts(10), _ts(10)),          # same ts, larger id: counts for rid=1
        (3, 1, _ts(5 * BUCKET + 7), _ts(5 * BUCKET + 7)),  # far bucket
        (4, 1, _ts(9 * BUCKET), None),      # after everything: NULL
        (5, 2, _ts(20), None),              # other key: no values at all
    ]
    _assert_suffix_equal(spark, rows)


def test_suffix_min_bucket_edges(spark):
    rows = [
        (1, 1, _ts(BUCKET - 1), None),
        (2, 1, _ts(BUCKET), _ts(BUCKET)),       # exactly on the edge
        (3, 1, _ts(BUCKET), None),               # same ts, larger id
        (4, 1, _ts(2 * BUCKET - 1), _ts(2 * BUCKET - 1)),
    ]
    _assert_suffix_equal(spark, rows)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 3),       # key
            st.integers(0, 40_000),  # ts offset
            st.booleans(),           # has value?
        ),
        min_size=1,
        max_size=50,
    ),
    bucket_s=st.integers(1, 7200),
)
def test_suffix_min_equals_single_window(spark, rows, bucket_s):
    data = [
        (i, k, _ts(off), _ts(off) if has else None)
        for i, (k, off, has) in enumerate(rows)
    ]
    _assert_suffix_equal(spark, data, bucket_s=bucket_s)


# ---- salted_next: the forward LEAD mirror ----


def _classic_next(df):
    w = Window.partitionBy("key").orderBy("ts", "rid")
    return df.withColumn("next_etype", F.lead("etype").over(w)).withColumn(
        "next_ts", F.lead("ts").over(w)
    )


def _assert_next_equal(spark, rows, bucket_s=BUCKET):
    from sec_edgar_spark.operators.relational import salted_next

    df = spark.createDataFrame(
        rows, "rid long, key long, ts timestamp, etype string"
    )
    cols = ["key", "rid", "ts", "etype", "next_etype", "next_ts"]
    got = sorted(
        map(
            tuple,
            salted_next(
                df, "key", "ts", ["rid"], ["etype", "ts"],
                bucket_s=bucket_s,
            ).select(cols).collect(),
        )
    )
    want = sorted(map(tuple, _classic_next(df).select(cols).collect()))
    assert got == want and got


def test_next_carry_edges_and_ties(spark):
    rows = [
        (1, 1, _ts(10), "a"),
        (2, 1, _ts(10), "b"),            # same ts, larger id: IS rid 1's next
        (3, 1, _ts(4 * BUCKET), "c"),    # far bucket: rid 2's next via carry
        (4, 1, _ts(4 * BUCKET), "d"),
        (5, 2, _ts(BUCKET), "e"),        # exactly on an edge, key alone
    ]
    _assert_next_equal(spark, rows)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 40_000)),
        min_size=1,
        max_size=50,
    ),
    bucket_s=st.integers(1, 7200),
)
def test_next_equals_single_window(spark, rows, bucket_s):
    data = [
        (i, k, _ts(off), "t" + str(i % 4))
        for i, (k, off) in enumerate(rows)
    ]
    _assert_next_equal(spark, data, bucket_s=bucket_s)


def test_scd2_build_salted_equals_classic(spark):
    from sec_edgar_spark.operators.scd import scd2_build

    rows = [
        (1, "signup", _ts(10), 1),
        (1, "active", _ts(10), 2),          # tie: id order decides
        (1, "churned", _ts(7 * BUCKET), 3),
        (2, "signup", _ts(BUCKET), 4),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    cols = ["user_id", "status", "valid_from", "valid_to", "is_current"]
    classic = sorted(map(tuple, scd2_build(ev).select(cols).collect()))
    salted = sorted(
        map(tuple, scd2_build(ev, bucket_s=BUCKET).select(cols).collect())
    )
    assert classic == salted and classic
