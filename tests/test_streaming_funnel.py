"""Stateful streaming funnel: conversion, expiry, cross-batch state,
and batch-twin parity on the real events parquet."""

import json
import os

import pytest
from pyspark.sql import functions as F


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.mark.timeout(240)
def test_funnel_stream_converts_and_expires(spark, tmp_path):
    from sec_edgar_spark.streaming.funnel_stream import funnel_stream

    watch = tmp_path / "ev"
    watch.mkdir()
    # batch 1: u1 views at 10:00 (converts in batch 2); u2 views at
    # 10:05 (never converts; expires when the watermark passes 11:05)
    _write(watch / "b1.json", [
        {"user_id": 1, "ts": "2024-01-01 10:00:00", "event_type": "view"},
        {"user_id": 2, "ts": "2024-01-01 10:05:00", "event_type": "view"},
        {"user_id": 1, "ts": "2024-01-01 10:01:00", "event_type": "click"},
    ])

    stream = (
        spark.readStream.schema("user_id long, ts string, event_type string")
        .json(str(watch))
        .select(F.to_timestamp("ts").alias("ts"), "user_id", "event_type")
        .withWatermark("ts", "0 seconds")
    )
    out = funnel_stream(stream, horizon_seconds=3600)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_funnel")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: u1 purchases at 10:30 -> conversion; an event far in
        # the future advances the watermark past u2's horizon
        _write(watch / "b2.json", [
            {"user_id": 1, "ts": "2024-01-01 10:30:00", "event_type": "purchase"},
            {"user_id": 9, "ts": "2024-01-01 13:00:00", "event_type": "click"},
        ])
        q.processAllAvailable()
        # one more batch so the timeout fires after the watermark moved
        _write(watch / "b3.json", [
            {"user_id": 9, "ts": "2024-01-01 13:00:01", "event_type": "click"},
        ])
        q.processAllAvailable()

        rows = {
            (r.user_id, str(r.view_ts)): r.converted
            for r in spark.sql("SELECT * FROM t_funnel").collect()
        }
        assert rows[(1, "2024-01-01 10:00:00")] is True
        assert rows[(2, "2024-01-01 10:05:00")] is False
        assert len(rows) == 2
    finally:
        q.stop()


@pytest.mark.timeout(240)
def test_funnel_stream_dead_pending_view_with_new_data_does_not_crash(
    spark, tmp_path
):
    """ADVICE r4 crash scenario: a PENDING view whose deadline fell
    behind the watermark while the same user receives new data — the
    data path (hasTimedOut=False) would re-register a timeout
    at/behind the watermark, which EventTimeTimeout rejects, killing
    the query.  The fix expires dead pending views inline
    (converted=false) and clamps any re-registered timeout above the
    watermark.

    Choreography: b1 u1 view@10:00 (deadline 11:00) → b2 u9 click@13:00
    advances the watermark to 13:00 → b3 u1 click@13:30 arrives with
    the dead view notionally pending (maxFilesPerTrigger=1, b2+b3
    drained together so no idle gap).  Empirically the file-source
    engine settles the due timeout in its own batch before u1's data
    batch runs, so the old code survives this path too — the inline
    expiry + clamp is defense-in-depth for sources/timings that
    interleave data and watermark advancement in one trigger.  The
    assertions pin the behavior contract either way: no query
    exception, and exactly one converted=false row for the dead view.
    """
    from sec_edgar_spark.streaming.funnel_stream import funnel_stream

    watch = tmp_path / "ev"
    watch.mkdir()
    _write(watch / "b1.json", [
        {"user_id": 1, "ts": "2024-01-01 10:00:00", "event_type": "view"},
    ])
    stream = (
        spark.readStream.schema("user_id long, ts string, event_type string")
        .option("maxFilesPerTrigger", "1")
        .json(str(watch))
        .select(F.to_timestamp("ts").alias("ts"), "user_id", "event_type")
        .withWatermark("ts", "0 seconds")
    )
    out = funnel_stream(stream, horizon_seconds=3600)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_funnel_late")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(watch / "b2.json", [
            {"user_id": 9, "ts": "2024-01-01 13:00:00", "event_type": "click"},
        ])
        _write(watch / "b3.json", [
            {"user_id": 1, "ts": "2024-01-01 13:30:00", "event_type": "click"},
        ])
        q.processAllAvailable()
        assert q.exception() is None
        rows = {
            (r.user_id, str(r.view_ts)): r.converted
            for r in spark.sql("SELECT * FROM t_funnel_late").collect()
        }
        assert rows[(1, "2024-01-01 10:00:00")] is False
    finally:
        q.stop()


@pytest.mark.timeout(240)
@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"), reason="testdata not present"
)
def test_funnel_stream_matches_batch_twin_on_real_events(spark, tmp_path):
    """Streaming↔batch parity on the REAL events parquet (the
    TIMESTAMP_NTZ surface that bit round 3): drive every sf0.001 event
    through the stateful funnel, roll the per-view verdicts up to the
    per-day shape, and compare with events_funnel_conversion exactly.

    sf0.001 has zero same-user equal-ts view/purchase ties (checked),
    so the stream's arrival-order tie relaxation cannot diverge here.
    A sentinel event one day past max(ts)+horizon pushes the watermark
    over every real view's deadline so the state drains completely.
    """
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.queries.events import events_funnel_conversion
    from sec_edgar_spark.streaming.funnel_stream import funnel_stream

    sf_dir = "/root/testdata/sf0.001"
    events = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")

    src = tmp_path / "events_stream"
    events.coalesce(1).write.parquet(str(src / "b1"))
    max_ts = events.agg(F.max("ts")).collect()[0][0]

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        .withWatermark("ts", "0 seconds")
    )
    out = funnel_stream(stream, horizon_seconds=3600)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_funnel_parity")
        .start()
    )
    try:
        q.processAllAvailable()
        # sentinel advances the watermark past every pending deadline...
        sent = spark.createDataFrame(
            [(999_999_999, max_ts + __import__("datetime").timedelta(days=1), "click")],
            "user_id long, ts timestamp, event_type string",
        )
        sent.write.parquet(str(src / "b2"))
        q.processAllAvailable()
        # ...and one more batch so the event-time timeouts actually fire.
        sent.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 SECOND")).write.parquet(
            str(src / "b3")
        )
        q.processAllAvailable()
        assert q.exception() is None

        stream_daily = {
            (str(r.view_date)): (r.n_views, r.n_converted)
            for r in spark.sql(
                """
                SELECT CAST(view_ts AS DATE) AS view_date,
                       COUNT(*) AS n_views,
                       SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS n_converted
                FROM t_funnel_parity GROUP BY 1
                """
            ).collect()
        }
        batch_daily = {
            str(r.view_date): (r.n_views, r.n_converted)
            for r in events_funnel_conversion(spark, sf_dir).collect()
        }
        assert stream_daily == batch_daily
    finally:
        q.stop()
