"""Property-based equality: salted_sessionize ≡ the single-window form
on RANDOM event streams with RANDOM gap/bucket parameters — the
adversarial-case tests in test_sessionize.py pin known traps; these
search for unknown ones (hypothesis shrinks any counterexample to a
minimal stream)."""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from sec_edgar_spark.functions.scalars import epoch_s
from sec_edgar_spark.operators.sessionize import salted_sessionize

BASE = 1_700_000_000

# Streams dense enough to form multi-event sessions AND sparse enough
# to split: offsets span several bucket lengths at the smallest bucket.
events_strategy = st.lists(
    st.tuples(
        st.integers(1, 3),              # user_id
        st.integers(0, 40_000),         # epoch offset (s)
    ),
    min_size=1,
    max_size=60,
)


def _single_window(events, gap_s):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (epoch_s("ts") - epoch_s(F.lag("ts").over(w)) > gap_s),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    return (
        marked.select(
            "user_id", "ts", "event_id",
            F.sum("is_start").over(wrun).alias("session_id"),
        )
        .groupBy(
            "user_id", F.col("session_id").cast("bigint").alias("session_id")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min(epoch_s("ts")).cast("bigint").alias("first_ep"),
            F.max(epoch_s("ts")).cast("bigint").alias("last_ep"),
        )
    )


@settings(max_examples=12, deadline=None)
@given(
    rows=events_strategy,
    gap_s=st.integers(60, 3600),
    bucket_mult=st.integers(2, 8),
)
def test_salted_equals_single_window(spark, rows, gap_s, bucket_mult):
    bucket_s = gap_s * bucket_mult
    data = [
        (u, datetime.datetime.utcfromtimestamp(BASE + off), i)
        for i, (u, off) in enumerate(rows)
    ]
    events = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long"
    )
    got = sorted(
        map(
            tuple,
            salted_sessionize(
                events, gap_s=gap_s, bucket_s=bucket_s
            ).collect(),
        )
    )
    want = sorted(map(tuple, _single_window(events, gap_s).collect()))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 20_000)),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(1, 6),
    tol_s=st.integers(60, 5000),
)
def test_capped_recent_join_equals_bruteforce(spark, rows, k, tol_s):
    """capped_recent_join ≡ 'k most recent in-window right rows per
    left row' computed brute-force in Python.  Left = every event,
    right = every event (self-association, duplicate timestamps
    common by construction)."""
    from sec_edgar_spark.operators.interval import capped_recent_join

    data = [
        (u, datetime.datetime.utcfromtimestamp(BASE + off), i)
        for i, (u, off) in enumerate(rows)
    ]
    left = spark.createDataFrame(
        data, "key long, lts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [(u, t, i + 10_000) for (u, t, i) in data],
        "key long, rts timestamp, rid long",
    )
    out = capped_recent_join(
        left, right, on="key", left_ts="lts", right_ts="rts",
        right_id="rid", k=k, tolerance=f"{tol_s} SECONDS",
    )
    got = sorted((r.lid, r.rid) for r in out.collect())

    # brute force
    want = []
    by_key = {}
    for u, t, i in data:
        by_key.setdefault(u, []).append((t, i + 10_000))
    for u, t, i in data:
        cand = sorted(
            (rt, rid)
            for rt, rid in by_key.get(u, [])
            if rt <= t and (t - rt).total_seconds() <= tol_s
        )
        want.extend((i, rid) for rt, rid in cand[-k:])
    assert got == sorted(want)
