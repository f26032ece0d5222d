"""Native session_window stream: append-mode emissions equal the batch
twin (events_session_native / session_rollup) on the real parquet."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.timeout(240)
@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_session_native_stream_matches_batch(spark, tmp_path):
    """Drive all sf0.001 events through the native session window in
    two arrival waves; after the second wave a far-future heartbeat
    event pushes the watermark past every session's end, so append
    mode must have emitted exactly the batch result (plus the
    heartbeat's own singleton session, which we exclude)."""
    from sec_edgar_spark.streaming.session_native import (
        run_to_memory_sink,
        session_rollup,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select("user_id", "ts")
    feed = tmp_path / "feed"
    ev.filter(F.dayofmonth("ts") <= 15).write.parquet(str(feed / "b1"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "4")
        .parquet(str(feed) + "/*")
    )
    q = run_to_memory_sink(
        stream, gap_seconds=1800, watermark="0 seconds", query_name="t_sess_nat"
    )
    try:
        q.processAllAvailable()
        ev.filter(F.dayofmonth("ts") > 15).write.parquet(str(feed / "b2"))
        q.processAllAvailable()
        # heartbeat: watermark jumps past all real sessions
        spark.createDataFrame(
            [(999999, "2030-01-01 00:00:00")], "user_id long, ts string"
        ).select("user_id", F.col("ts").cast("timestamp")).write.parquet(
            str(feed / "hb")
        )
        q.processAllAvailable()
        assert q.exception() is None

        got = {
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in spark.sql(
                "SELECT * FROM t_sess_nat WHERE user_id != 999999"
            ).collect()
        }
        want = {
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in session_rollup(ev, gap_seconds=1800).collect()
        }
        assert got == want
    finally:
        q.stop()


@pytest.mark.timeout(240)
@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_session_native_restart_from_checkpoint(spark, tmp_path):
    """Kill the query between waves and restart from the SAME
    checkpoint: sessions must come out exactly once — the state store +
    offset log carry across process generations (the exactly-once
    contract a 1000-executor deployment leans on)."""
    from sec_edgar_spark.streaming.session_native import session_rollup

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select("user_id", "ts")
    feed = tmp_path / "feed"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ev.filter(F.dayofmonth("ts") <= 15).write.parquet(str(feed / "b1"))

    def start():
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", "4")
            .parquet(str(feed) + "/*")
        )
        rolled = session_rollup(
            stream.withWatermark("ts", "0 seconds"), gap_seconds=1800
        )
        return (
            rolled.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()  # simulate a crash/redeploy between waves

    ev.filter(F.dayofmonth("ts") > 15).write.parquet(str(feed / "b2"))
    spark.createDataFrame(
        [(999999, "2030-01-01 00:00:00")], "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp")).write.parquet(
        str(feed / "hb")
    )
    q2 = start()
    try:
        q2.processAllAvailable()
        assert q2.exception() is None
    finally:
        q2.stop()

    got = [
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.read.parquet(out).collect()
        if r.user_id != 999999
    ]
    want = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in session_rollup(ev, gap_seconds=1800).collect()
    }
    assert len(got) == len(set(got)), "duplicate emissions after restart"
    assert set(got) == want
