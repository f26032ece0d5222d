"""Streaming sliding-window rollup: snapshot equals the batch twin
(`events_sliding_daily`) on the real events parquet, including the
HLL-approx user count both ways."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.timeout(240)
@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present"
)
def test_sliding_stream_matches_batch_twin_on_real_events(spark, tmp_path):
    """Drive every sf0.001 event through the streaming sliding rollup
    (2-day windows, 1-day hop) in two micro-batches split mid-month,
    then compare the complete-mode snapshot with the batch query:
    n_events and total_value must match EXACTLY; n_users via
    approx_count_distinct must match the batch approx on the same rows
    (HLL++ register merges are order-insensitive, so stream==batch
    bit-for-bit).  Runs on the real TIMESTAMP_NTZ parquet surface."""
    from sec_edgar_spark.queries.events import events_sliding_daily
    from sec_edgar_spark.streaming.sliding_stream import run_to_memory_sink

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "ts", "event_type", "user_id", "value"
    )
    # two arrival waves out of event order within each wave
    feed = tmp_path / "feed"
    ev.filter(F.dayofmonth("ts") <= 15).write.parquet(str(feed / "b1"))
    b2 = ev.filter(F.dayofmonth("ts") > 15)
    # watermark needs TIMESTAMP (not NTZ): read with an explicit LTZ
    # schema — session tz is UTC, so wall-clock (and the day-aligned
    # window boundaries) match the batch side's NTZ arithmetic exactly
    stream = (
        spark.readStream.schema(
            "ts timestamp, event_type string, user_id long, value double"
        )
        .option("maxFilesPerTrigger", "4")
        .parquet(str(feed) + "/*")
    )
    q = run_to_memory_sink(stream, query_name="t_sliding")
    try:
        q.processAllAvailable()
        b2.write.parquet(str(feed / "b2"))
        q.processAllAvailable()
        assert q.exception() is None

        got = {
            (str(r.win_start), str(r.win_end), r.event_type): (
                r.n_events,
                r.n_users_approx,
                r.total_value,
            )
            for r in spark.sql("SELECT * FROM t_sliding").collect()
        }

        batch = events_sliding_daily(spark, SF_DIR)
        want_exact = {
            (str(r.win_start), str(r.win_end), r.event_type): (
                r.n_events,
                r.total_value,
            )
            for r in batch.collect()
        }
        assert set(got) == set(want_exact)
        for k, (n, _, tv) in got.items():
            wn, wtv = want_exact[k]
            assert n == wn, k
            assert tv == wtv, k

        # approx users: same HLL++ on the same rows -> identical
        want_approx = {
            (str(r.win_start), str(r.win_end), r.event_type): r.n_users_approx
            for r in ev.groupBy(
                F.window("ts", "2 days", "1 day").alias("w"), "event_type"
            )
            .agg(F.approx_count_distinct("user_id").alias("n_users_approx"))
            .select(
                F.col("w.start").cast("date").alias("win_start"),
                F.col("w.end").cast("date").alias("win_end"),
                "event_type",
                "n_users_approx",
            )
            .collect()
        }
        for k, (_, ua, _) in got.items():
            assert ua == want_approx[k], k
    finally:
        q.stop()
