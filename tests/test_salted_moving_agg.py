"""salted_moving_agg (operators/relational.py): exact equality with
the single-window bounded ROWS frame
``agg(col).over(partitionBy(key).orderBy(ts, id).rowsBetween(-(W-1), 0))``,
including the traps the rank-block split could get wrong — frames
crossing block boundaries, a key's first W-1 rows (short frames),
blocks the key skips entirely, frame width exactly equal to the block
size — plus the plan contract that every frame window carries the
block salt."""

import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from sec_edgar_spark.operators.relational import salted_moving_agg

BASE = 1_700_000_000
BUCKET = 3600


def _ts(off):
    return datetime.datetime.utcfromtimestamp(BASE + off)


def _classic(df, frame_rows):
    w = (
        Window.partitionBy("key")
        .orderBy("ts", "rid")
        .rowsBetween(-(frame_rows - 1), Window.currentRow)
    )
    return (
        df.withColumn("msum", F.sum("val").over(w))
        .withColumn("mcnt", F.count(F.lit(1)).over(w))
        .withColumn("mmin", F.min("val").over(w))
    )


def _assert_equal(spark, rows, frame_rows, block_rows=4, bucket_s=BUCKET):
    df = spark.createDataFrame(rows, "rid long, key long, ts timestamp, val long")
    cols = ["key", "rid", "ts", "val", "msum", "mcnt", "mmin"]
    got = sorted(
        map(
            tuple,
            salted_moving_agg(
                df, "key", "ts", ["rid"],
                aggs={
                    "msum": ("val", "sum"),
                    "mcnt": ("*", "count"),
                    "mmin": ("val", "min"),
                },
                frame_rows=frame_rows,
                block_rows=block_rows,
                bucket_s=bucket_s,
            ).select(cols).collect(),
        )
    )
    want = sorted(
        map(tuple, _classic(df, frame_rows).select(cols).collect())
    )
    assert got == want and got


def test_frames_cross_block_boundaries(spark):
    """11 rows, block_rows=4, W=3: frames at ranks 5, 9 need the
    carried tail of the previous block."""
    rows = [(i, 1, _ts(i * 60), i * 10) for i in range(11)]
    _assert_equal(spark, rows, frame_rows=3, block_rows=4)


def test_short_frames_at_key_start(spark):
    """Rank < W rows average over rank rows only — no phantom carry
    from a nonexistent block -1."""
    rows = [(1, 1, _ts(0), 7), (2, 1, _ts(60), 9), (3, 2, _ts(0), 5)]
    _assert_equal(spark, rows, frame_rows=4, block_rows=4)


def test_frame_width_equals_block_size(spark):
    """W == block_rows: every block carries all-but-one of its rows
    forward; the frame never spans three blocks."""
    rows = [(i, 1, _ts(i), i % 5) for i in range(13)]
    _assert_equal(spark, rows, frame_rows=4, block_rows=4)


def test_frame_rows_one_is_identity(spark):
    rows = [(i, 1, _ts(i * 9), i) for i in range(6)]
    _assert_equal(spark, rows, frame_rows=1, block_rows=4)


def test_many_keys_and_time_bucket_interaction(spark):
    """Blocks are rank-based while salted_rank's salt is time-based:
    rows sparse over many time buckets must still produce dense
    consecutive ranks inside each block cell."""
    rows = [
        (1, 1, _ts(10), 4),
        (2, 1, _ts(5 * BUCKET + 10), 1),
        (3, 1, _ts(9 * BUCKET), 6),
        (4, 1, _ts(9 * BUCKET + 1), 2),
        (5, 1, _ts(12 * BUCKET), 3),
        (6, 2, _ts(2 * BUCKET), 9),
        (7, 2, _ts(2 * BUCKET + 1), 8),
    ]
    _assert_equal(spark, rows, frame_rows=3, block_rows=4)


def test_equal_timestamps_tiebreak(spark):
    rows = [(9, 1, _ts(5), 1), (3, 1, _ts(5), 2), (7, 1, _ts(5), 3),
            (1, 1, _ts(5), 4), (2, 1, _ts(5), 5)]
    _assert_equal(spark, rows, frame_rows=2, block_rows=4)


def test_block_rows_must_cover_frame(spark):
    df = spark.createDataFrame([], "rid long, key long, ts timestamp, val long")
    with pytest.raises(ValueError, match="block_rows"):
        salted_moving_agg(
            df, "key", "ts", ["rid"], aggs={"s": ("val", "sum")},
            frame_rows=8, block_rows=4,
        )


def test_frame_rows_must_be_positive(spark):
    df = spark.createDataFrame([], "rid long, key long, ts timestamp, val long")
    with pytest.raises(ValueError, match="frame_rows"):
        salted_moving_agg(
            df, "key", "ts", ["rid"], aggs={"s": ("val", "sum")},
            frame_rows=0,
        )


def test_unknown_agg_fn_rejected(spark):
    df = spark.createDataFrame([], "rid long, key long, ts timestamp, val long")
    with pytest.raises(ValueError, match="unsupported agg fn"):
        salted_moving_agg(
            df, "key", "ts", ["rid"], aggs={"s": ("val", "median")},
            frame_rows=2,
        )


def test_frame_windows_are_block_salted(spark):
    """Plan contract: every key-partitioned row window carries a salt
    column (_srk_bkt from salted_rank or _sma_bkt from the frame pass)
    — no window over the bare key anywhere in the composition."""
    df = spark.createDataFrame(
        [(1, 1, _ts(0), 1)], "rid long, key long, ts timestamp, val long"
    )
    plan = (
        salted_moving_agg(
            df, "key", "ts", ["rid"], aggs={"s": ("val", "sum")},
            frame_rows=4,
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    row_windows = [
        ln for ln in plan.splitlines() if "windowspecdefinition(key" in ln
    ]
    assert row_windows, plan
    for ln in row_windows:
        assert "_srk_bkt" in ln or "_sma_bkt" in ln, ln


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 40_000), st.integers(-5, 5)),
        min_size=1,
        max_size=50,
    ),
    frame_rows=st.integers(1, 6),
    block_rows=st.integers(6, 9),
    bucket_s=st.integers(1, 7200),
)
def test_salted_moving_agg_equals_single_window(
    spark, rows, frame_rows, block_rows, bucket_s
):
    """Property equality on random streams, frame widths, block sizes
    and time-bucket widths (down to 1 s buckets)."""
    data = [(i, u, _ts(off), v) for i, (u, off, v) in enumerate(rows)]
    _assert_equal(
        spark, data, frame_rows=frame_rows, block_rows=block_rows,
        bucket_s=bucket_s,
    )
