"""Streaming count-min: batch/stream sketch and estimate parity."""

import json

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators.sketches import countmin_build, countmin_estimate


def _write_batchfile(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.mark.timeout(180)
def test_stream_sketch_matches_batch(spark, tmp_path):
    from sec_edgar_spark.streaming.countmin_stream import run_to_memory_sink

    watch = tmp_path / "toks"
    watch.mkdir()
    rows1 = [{"tok": f"w{i % 17}"} for i in range(300)]
    rows2 = [{"tok": f"w{i % 5}"} for i in range(100)] + [
        {"tok": f"rare{i}"} for i in range(20)
    ]
    _write_batchfile(watch / "f1.json", rows1)

    stream = spark.readStream.schema("tok string").json(str(watch))
    q = run_to_memory_sink(stream, "tok", query_name="t_cms")
    try:
        q.processAllAvailable()
        _write_batchfile(watch / "f2.json", rows2)
        q.processAllAvailable()

        snap = (
            spark.sql("SELECT * FROM t_cms")
            .groupBy("row", "bucket")
            .agg(F.max("cnt").alias("cnt"))
        )
        got = {(r.row, r.bucket): r.cnt for r in snap.collect()}

        batch_df = spark.createDataFrame(rows1 + rows2, "tok string")
        want_sk = countmin_build(batch_df, "tok")
        want = {(r.row, r.bucket): r.cnt for r in want_sk.collect()}
        assert got == want

        # estimates from the snapshot match batch estimates, and upper-
        # bound the true counts (count-min's one-sided error guarantee)
        terms = spark.createDataFrame(
            [{"tok": "w0"}, {"tok": "w3"}, {"tok": "rare1"}], "tok string"
        )
        est_stream = {
            r.tok: r.cms_estimate
            for r in countmin_estimate(snap, terms, "tok").collect()
        }
        est_batch = {
            r.tok: r.cms_estimate
            for r in countmin_estimate(want_sk, terms, "tok").collect()
        }
        assert est_stream == est_batch
        true_counts = {"w0": 18 + 20, "w3": 18 + 20, "rare1": 1}
        # w0/w3: 300 rows over 17 toks -> 18 each (i%17 hits 0..16 evenly
        # for 0..288, then 289..299 covers 0..10 once more -> w0..w10 get 18)
        for t, true in true_counts.items():
            assert est_stream[t] >= true
    finally:
        q.stop()
