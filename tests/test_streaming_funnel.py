"""Stateful streaming funnel: conversion, expiry, cross-batch state."""

import json

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
