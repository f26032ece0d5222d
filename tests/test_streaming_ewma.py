"""Streaming EWMA: day-ordered waves of the real events parquet
produce bit-identical values to the batch sorted fold; replayed days
are ignored."""
# Feed discipline: every wave is written as ONE file (coalesce(1)) so
# the file stream delivers it as one in-order micro-batch — a
# multi-file wave can split across batches under load, arrive in file
# order, and the streams' replay tolerance (day <= last folded day is
# dropped) would then silently lose the out-of-order days.  The
# modules' input contract ("per-day counts arrive complete and in day
# order per key") is exactly this.


import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_stream_matches_batch_fold(spark, tmp_path):
    from sec_edgar_spark.queries.scalepats import events_ewma_smoothing
    from sec_edgar_spark.streaming.ewma_stream import ewma_stream

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # pre-rolled daily counts with an epoch-day key (the stream input
    # contract); ts is TIMESTAMP(NANOS) in this parquet so read via the
    # catalog-equivalent long cast
    from sec_edgar_spark.catalog import table

    e = table(spark, SF_DIR, "events")
    daily = e.groupBy(
        "user_id",
        F.datediff(
            F.to_date(F.date_trunc("day", "ts")), F.lit("1970-01-01")
        ).cast("long").alias("day_epoch"),
    ).agg(F.count("*").alias("cnt"))

    feed = tmp_path / "feed"
    lo, hi = [
        r[0]
        for r in daily.agg(F.min("day_epoch")).collect()
    ], [r[0] for r in daily.agg(F.max("day_epoch")).collect()]
    mid = (lo[0] + hi[0]) // 2
    daily.filter(F.col("day_epoch") <= mid).coalesce(1).write.parquet(str(feed / "w1"))

    stream = (
        spark.readStream.schema("user_id long, day_epoch long, cnt long")
        .option("maxFilesPerTrigger", "1000")
        .parquet(str(feed) + "/*")
    )
    out_dir = str(tmp_path / "out")

    rows = {}

    def sink(batch_df, _bid):
        for r in batch_df.collect():
            rows[r.user_id] = (r.n_days, r.ewma)

    q = (
        ewma_stream(stream)
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
        r.user_id: (r.n_days, r.ewma)
        for r in events_ewma_smoothing(spark, SF_DIR).collect()
    }
    # batch query filters n_days >= 5; compare on its support
    for uid, (nd, ew) in want.items():
        assert uid in rows
        assert rows[uid][0] == nd
        assert rows[uid][1] == ew  # bit-identical fold


def test_fold_days_constants_pinned():
    """The streaming buffer bound must mirror the batch cap."""
    from sec_edgar_spark.queries.scalepats import _EWMA_FOLD_DAYS
    from sec_edgar_spark.streaming.ewma_stream import FOLD_DAYS

    assert FOLD_DAYS == _EWMA_FOLD_DAYS == 90


def test_parity_past_the_cap(spark, tmp_path):
    """A 120-observed-day history must converge to the batch semantics:
    n_days = 90 (the buffer bound) and ewma = the fold over the NEWEST
    90 observations from a zero seed — i.e. streaming refolds its
    truncated buffer rather than carrying pre-cap weight, matching
    scalepats._capped_daily at any history length."""
    from sec_edgar_spark.streaming.ewma_stream import FOLD_DAYS, ewma_stream

    days = list(range(120))
    cnts = [(d * 7) % 13 + 1 for d in days]
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
            (r.user_id, r.n_days, r.ewma) for r in batch_df.collect()
        )

    q = (
        ewma_stream(stream)
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

    want = 0.0
    for c in cnts[-FOLD_DAYS:]:
        want = want * 0.75 + c * 0.25
    assert seen[-1] == (1, FOLD_DAYS, want)


def test_replayed_days_ignored(spark, tmp_path):
    from sec_edgar_spark.streaming.ewma_stream import ewma_stream

    feed = tmp_path / "feed"
    b = spark.createDataFrame(
        [(1, 10, 4), (1, 11, 8)], "user_id long, day_epoch long, cnt long"
    )
    b.coalesce(1).write.parquet(str(feed / "w1"))
    stream = (
        spark.readStream.schema("user_id long, day_epoch long, cnt long")
        .option("maxFilesPerTrigger", "1000")
        .parquet(str(feed) + "/*")
    )
    seen = []

    def sink(batch_df, _bid):
        seen.extend(
            (r.user_id, r.n_days, r.ewma) for r in batch_df.collect()
        )

    q = (
        ewma_stream(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # duplicate day 11 plus a genuinely new day 12
        spark.createDataFrame(
            [(1, 11, 999), (1, 12, 4)],
            "user_id long, day_epoch long, cnt long",
        ).coalesce(1).write.parquet(str(feed / "w2"))
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    expect1 = 0.0 * 0.75 + 4 * 0.25
    expect2 = expect1 * 0.75 + 8 * 0.25
    expect3 = expect2 * 0.75 + 4 * 0.25  # the 999 replay is ignored
    assert seen[-1] == (1, 3, expect3)
