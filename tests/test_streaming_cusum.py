"""Streaming CUSUM: day-ordered waves of the real events parquet
produce bit-identical detector output to the batch query; the buffer
bound mirrors the batch cap."""
# Feed discipline: every wave is written as ONE file (coalesce(1)) so
# the file stream delivers it as one in-order micro-batch — a
# multi-file wave can split across batches under load, arrive in file
# order, and the streams' replay tolerance (day <= last folded day is
# dropped) would then silently lose the out-of-order days.  The
# modules' input contract ("per-day counts arrive complete and in day
# order per key") is exactly this.


import datetime
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
EPOCH = datetime.date(1970, 1, 1)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_stream_matches_batch_detector(spark, tmp_path):
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.queries.scalepats import events_cusum_changepoint
    from sec_edgar_spark.streaming.cusum_stream import cusum_stream

    e = table(spark, SF_DIR, "events")
    daily = e.groupBy(
        "user_id",
        F.datediff(
            F.to_date(F.date_trunc("day", "ts")), F.lit("1970-01-01")
        ).cast("long").alias("day_epoch"),
    ).agg(F.count("*").alias("cnt"))

    feed = tmp_path / "feed"
    lo = daily.agg(F.min("day_epoch")).collect()[0][0]
    hi = daily.agg(F.max("day_epoch")).collect()[0][0]
    mid = (lo + hi) // 2
    daily.filter(F.col("day_epoch") <= mid).coalesce(1).write.parquet(str(feed / "w1"))

    stream = (
        spark.readStream.schema("user_id long, day_epoch long, cnt long")
        .option("maxFilesPerTrigger", "1000")
        .parquet(str(feed) + "/*")
    )

    rows = {}

    def sink(batch_df, _bid):
        for r in batch_df.collect():
            rows[r.user_id] = (
                r.n_days, r.total, r.n_changepoints, r.max_cusum,
                r.first_cp_day,
            )

    q = (
        cusum_stream(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        daily.filter(F.col("day_epoch") > mid).coalesce(1).write.parquet(str(feed / "w2"))
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    want = {
        r.user_id: (
            r.n_days, r.total, r.n_changepoints, r.max_cusum,
            (r.first_cp_day - EPOCH).days,
        )
        for r in events_cusum_changepoint(spark, SF_DIR).collect()
    }
    assert want
    # batch query filters n_days >= 5; compare on its support
    for uid, tup in want.items():
        assert uid in rows
        assert rows[uid] == tup  # exact integers: bit-identical


def test_fold_days_constant_pinned():
    from sec_edgar_spark.queries.scalepats import _EWMA_FOLD_DAYS
    from sec_edgar_spark.streaming.cusum_stream import FOLD_DAYS

    assert FOLD_DAYS == _EWMA_FOLD_DAYS == 90


def test_refold_matches_manual_scan():
    """Pure-function check of the shared recurrence, including the
    first-crossing capture and the window-derived threshold."""
    from sec_edgar_spark.streaming.cusum_stream import _refold

    # uniform: never alarms
    n, s, n_cp, mx, fd = _refold(list(range(100, 110)), [3] * 10)
    assert (n, s, n_cp, mx, fd) == (10, 30, 0, 0, 0)
    # shift: 1/day x10 then 9/day x10 (same arithmetic as the batch
    # invariant test: +60/step after the shift, H = 400)
    days = list(range(200, 220))
    cnts = [1] * 10 + [9] * 10
    n, s, n_cp, mx, fd = _refold(days, cnts)
    assert (n, s) == (20, 100)
    assert n_cp == 1
    assert fd == 216  # 7th shifted day: ceil(400/60) = 7 -> day index 16
    assert mx == 600


def test_parity_past_the_cap(spark, tmp_path):
    """A 120-observed-day history must converge to the batch
    semantics: the buffer truncates to the newest 90 observations and
    the detector refolds with the TRUNCATED window's own (n, s) — the
    window-repriced recurrence, checked against _refold over exactly
    cnts[-90:]."""
    from sec_edgar_spark.streaming.cusum_stream import (
        FOLD_DAYS,
        _refold,
        cusum_stream,
    )

    days = list(range(120))
    cnts = [(d * 7) % 13 + 1 for d in days]
    # spike the tail so the detector actually fires inside the window
    cnts[-10:] = [40] * 10
    feed = tmp_path / "feed"
    spark.createDataFrame(
        [(1, d, c) for d, c in zip(days[:70], cnts[:70])],
        "user_id long, day_epoch long, cnt long",
    ).coalesce(1).write.parquet(str(feed / "w1"))
    stream = (
        spark.readStream.schema("user_id long, day_epoch long, cnt long")
        .option("maxFilesPerTrigger", "1000")
        .parquet(str(feed) + "/*")
    )
    seen = []

    def sink(batch_df, _bid):
        seen.extend(
            (
                r.user_id, r.n_days, r.total, r.n_changepoints,
                r.max_cusum, r.first_cp_day,
            )
            for r in batch_df.collect()
        )

    q = (
        cusum_stream(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(1, d, c) for d, c in zip(days[70:], cnts[70:])],
            "user_id long, day_epoch long, cnt long",
        ).coalesce(1).write.parquet(str(feed / "w2"))
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    n, s, n_cp, mx, fd = _refold(days[-FOLD_DAYS:], cnts[-FOLD_DAYS:])
    assert n == FOLD_DAYS
    assert n_cp >= 1  # the spike fires within the truncated window
    assert seen[-1] == (1, n, s, n_cp, mx, fd)
