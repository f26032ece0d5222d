"""salted_sessionize (operators/sessionize.py): exact equality with the
single-window lag→flag→cumsum form, including the adversarial cases the
bucket split could get wrong — sessions spanning many bucket edges,
boundary-exact gaps, users skipping whole buckets."""

import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sec_edgar_spark.functions.scalars import epoch_s
from sec_edgar_spark.operators.sessionize import salted_sessionize

GAP = 30 * 60
BUCKET = 6 * 3600


def _single_window(events):
    """The reference formulation (events_sessionize's plan)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (epoch_s("ts") - epoch_s(F.lag("ts").over(w)) > GAP),
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
        .groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min(epoch_s("ts")).cast("bigint").alias("first_ep"),
            F.max(epoch_s("ts")).cast("bigint").alias("last_ep"),
        )
    )


def _assert_equal(spark, rows):
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    )
    got = sorted(
        map(tuple, salted_sessionize(events, gap_s=GAP, bucket_s=BUCKET).collect())
    )
    want = sorted(map(tuple, _single_window(events).collect()))
    assert got == want and got


def _ts(epoch):
    return datetime.datetime.utcfromtimestamp(epoch)


def test_session_spanning_many_buckets(spark):
    """Continuous activity every 20 min for 30 h = ONE session crossing
    five 6 h bucket edges; a second session starts after a 31-min gap."""
    base = 1_700_000_000 - (1_700_000_000 % BUCKET) + 100
    rows = [(1, _ts(base + i * 1200), i) for i in range(90)]
    last = base + 89 * 1200
    rows += [(1, _ts(last + GAP + 60), 500), (1, _ts(last + GAP + 120), 501)]
    _assert_equal(spark, rows)


def test_boundary_exact_gap_is_same_session(spark):
    """gap == GAP exactly is NOT a boundary (strict >) — including when
    the two events straddle a bucket edge."""
    edge = 1_700_000_000 - (1_700_000_000 % BUCKET)
    rows = [
        (1, _ts(edge - 10), 1),
        (1, _ts(edge - 10 + GAP), 2),      # exactly GAP later, next bucket
        (1, _ts(edge - 10 + GAP + GAP + 1), 3),  # GAP+1 later: new session
    ]
    _assert_equal(spark, rows)


def test_user_skips_whole_buckets(spark):
    edge = 1_700_000_000 - (1_700_000_000 % BUCKET)
    rows = [
        (1, _ts(edge + 5), 1),
        (1, _ts(edge + 3 * BUCKET + 5), 2),  # silent for 3 buckets
        (2, _ts(edge + 7), 3),               # another user interleaved
        (2, _ts(edge + 8), 4),
    ]
    _assert_equal(spark, rows)


def test_equal_timestamps_tiebreak_by_id(spark):
    edge = 1_700_000_000 - (1_700_000_000 % BUCKET)
    rows = [
        (1, _ts(edge + 5), 7),
        (1, _ts(edge + 5), 3),
        (1, _ts(edge + 5 + GAP + 1), 9),
    ]
    _assert_equal(spark, rows)


def test_matches_on_real_testdata(spark):
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("testdata not present")
    from sec_edgar_spark.catalog import table

    events = table(spark, sf, "events").select("user_id", "ts", "event_id")
    got = sorted(
        map(tuple, salted_sessionize(events, gap_s=GAP, bucket_s=BUCKET).collect())
    )
    want = sorted(map(tuple, _single_window(events).collect()))
    assert got == want and len(got) > 100


def test_bucket_must_exceed_gap(spark):
    df = spark.createDataFrame([], "user_id long, ts timestamp, event_id long")
    with pytest.raises(ValueError, match="must exceed"):
        salted_sessionize(df, gap_s=3600, bucket_s=3600)


def test_local_window_is_bucket_salted(spark):
    """Plan contract: the event-level window partitions by
    (user, bucket), never by user alone — the whole point."""
    df = spark.createDataFrame(
        [(1, _ts(1_700_000_000), 1)], "user_id long, ts timestamp, event_id long"
    )
    plan = (
        salted_sessionize(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    event_windows = [
        ln for ln in plan.splitlines() if "windowspecdefinition(user_id" in ln
    ]
    assert any("_bkt" in ln for ln in event_windows), plan
    # the only user-alone window is the fragment merge (operates on _first)
    for ln in event_windows:
        if "_bkt" not in ln:
            assert "_first" in ln, ln


def test_payload_entry_exit_matches_single_window(spark):
    """payload_cols returns per-session entry/exit structs — argmin/
    argmax by (ts, id) — bit-equal to the single-window session
    assembly + struct-extrema aggregation, including sessions spanning
    bucket edges and same-ts tie rows."""
    base = 1_700_000_000 - (1_700_000_000 % BUCKET)
    rows = []
    # one session crossing two bucket edges, with a same-ts tie pair
    for i in range(30):
        rows.append((1, _ts(base + i * 1200), i, f"t{i % 3}"))
    rows.append((1, _ts(base), 99, "tie"))  # same ts as event 0, larger id
    # a second session after a gap, single event (bounce)
    rows.append((1, _ts(base + 30 * 1200 + GAP + 61), 200, "solo"))
    rows.append((2, _ts(base + 7), 300, "x"))
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )

    got = sorted(
        map(
            tuple,
            salted_sessionize(
                events, gap_s=GAP, bucket_s=BUCKET,
                payload_cols=["event_type"],
            )
            .select(
                "user_id",
                "session_id",
                "n_events",
                F.col("entry.event_type").alias("entry_type"),
                F.col("exit.event_type").alias("exit_type"),
            )
            .collect(),
        )
    )

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (epoch_s("ts") - epoch_s(F.lag("ts").over(w)) > GAP),
            1,
        ).otherwise(0).alias("is_start"),
    )
    st = F.struct("ts", "event_id", "event_type")
    want = sorted(
        map(
            tuple,
            marked.select(
                "user_id", "ts", "event_id", "event_type",
                F.sum("is_start").over(wrun).alias("session_id"),
            )
            .groupBy(
                "user_id",
                F.col("session_id").cast("bigint").alias("session_id"),
            )
            .agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.min(st).getField("event_type").alias("entry_type"),
                F.max(st).getField("event_type").alias("exit_type"),
            )
            .collect(),
        )
    )
    assert got == want and len(got) >= 3


def test_payload_none_output_contract_unchanged(spark):
    """Without payload_cols the output schema stays the r10 5-column
    contract (events_sessionize_salted's gate hash depends on it)."""
    df = spark.createDataFrame(
        [(1, _ts(1_700_000_000), 1)],
        "user_id long, ts timestamp, event_id long",
    )
    assert salted_sessionize(df).columns == [
        "user_id", "session_id", "n_events", "first_ep", "last_ep",
    ]
