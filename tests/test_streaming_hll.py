"""Streaming HLL: batch/stream register and estimate parity."""

import json

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators.sketches import hll_estimate, hll_register_weights


def _write_batchfile(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.mark.timeout(180)
def test_stream_registers_match_batch(spark, tmp_path):
    from sec_edgar_spark.streaming.hll_stream import run_to_memory_sink

    watch = tmp_path / "events"
    watch.mkdir()
    rows1 = [
        {"event_type": "click", "user_id": i % 37} for i in range(200)
    ]
    rows2 = [
        {"event_type": "click", "user_id": 100 + (i % 11)} for i in range(50)
    ] + [{"event_type": "view", "user_id": i} for i in range(25)]
    _write_batchfile(watch / "f1.json", rows1)

    stream = spark.readStream.schema("event_type string, user_id long").json(
        str(watch)
    )
    item = F.concat(F.lit("u:"), F.col("user_id").cast("string"))
    q = run_to_memory_sink(stream, ["event_type"], item, query_name="t_hll")
    try:
        q.processAllAvailable()
        _write_batchfile(watch / "f2.json", rows2)
        q.processAllAvailable()

        # update-mode memory sink accumulates every emitted version of a
        # register row; min-fold the snapshot to the current registers.
        snap = (
            spark.sql("SELECT * FROM t_hll")
            .groupBy("event_type", "bucket")
            .agg(F.min("w").alias("w"))
        )
        got = {
            (r.event_type, r.bucket): r.w for r in snap.collect()
        }

        batch_df = spark.createDataFrame(
            rows1 + rows2, "event_type string, user_id long"
        )
        want_regs = hll_register_weights(batch_df, ["event_type"], item)
        want = {
            (r.event_type, r.bucket): r.w for r in want_regs.collect()
        }
        assert got == want

        # and the folded estimate equals the batch estimate bit-for-bit
        est_stream = {
            r.event_type: r.hll_estimate
            for r in hll_estimate(snap, ["event_type"]).collect()
        }
        est_batch = {
            r.event_type: r.hll_estimate
            for r in hll_estimate(want_regs, ["event_type"]).collect()
        }
        assert est_stream == est_batch
        # sanity: estimates in a plausible band around the true counts
        assert 15 <= est_stream["click"] <= 120  # true 48, m=16 sketch
    finally:
        q.stop()
