"""Streaming histogram: incremental counts match the batch expression."""

import json

import pytest
from pyspark.sql import functions as F


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.mark.timeout(180)
def test_histogram_stream_matches_batch(spark, tmp_path):
    from sec_edgar_spark.streaming.histogram_stream import (
        bucket_expr,
        run_to_memory_sink,
    )

    watch = tmp_path / "vals"
    watch.mkdir()
    batch1 = [{"value": v} for v in (0.5, 1.5, 2.5, 9.9, -3.0)]
    batch2 = [{"value": v} for v in (0.6, 42.0, 5.0, 5.1)]
    _write(watch / "b1.json", batch1)

    stream = spark.readStream.schema("value double").json(str(watch))
    q = run_to_memory_sink(stream, "value", lo=0.0, hi=10.0, n_buckets=10)
    try:
        q.processAllAvailable()
        _write(watch / "b2.json", batch2)
        q.processAllAvailable()

        got = {
            r.bucket: r.n for r in spark.sql("SELECT * FROM hist").collect()
        }
        all_rows = spark.createDataFrame(batch1 + batch2, "value double")
        want = {
            r.bucket: r.n
            for r in all_rows.select(
                bucket_expr(F.col("value"), 0.0, 10.0, 10).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want
        # out-of-range values clamped into the edge buckets
        assert want[0] >= 1 and want[9] >= 1
    finally:
        q.stop()
