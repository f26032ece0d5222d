"""Streaming decontamination gate — batch/stream parity on the real
documents parquet: streaming the train slice through in waves must
flag exactly the docs batch decontaminate flags, with identical
overlap counts."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present"
)


def test_decontam_stream_matches_batch(spark, tmp_path):
    from sec_edgar_spark.operators.sampling import decontaminate
    from sec_edgar_spark.streaming.decontam_stream import (
        decontam_stream,
        eval_shingle_index,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    train = d.filter(F.col("doc_id") % 13 != 0)
    eval_df = d.filter(F.col("doc_id") % 13 == 0)

    # feed the train slice in two waves, all inside one day window
    feed = tmp_path / "feed"
    stamped = train.withColumn(
        "ts", F.to_timestamp(F.lit("2024-03-01 12:00:00"))
    )
    stamped.filter(F.col("doc_id") % 2 == 0).write.parquet(
        str(feed / "w1")
    )
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1000")
        .parquet(str(feed) + "/*")
    )
    out = decontam_stream(stream, eval_shingle_index(eval_df))
    q = (
        out.writeStream.format("memory")
        .queryName("t_decontam")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        stamped.filter(F.col("doc_id") % 2 == 1).write.parquet(
            str(feed / "w2")
        )
        q.processAllAvailable()
        # append mode emits only after the watermark passes the window
        # end — push it past with a late sentinel doc that matches
        # nothing
        spark.createDataFrame(
            [(999_999, "z1 z2 z3 z4 z5 z6 z7 z8 z9", "2024-03-03 00:00:00")],
            "doc_id long, text string, ts string",
        ).select(
            "doc_id", "text", F.to_timestamp("ts").alias("ts")
        ).write.parquet(str(feed / "w3"))
        q.processAllAvailable()
        # the flush happens in the batch AFTER the watermark advance —
        # one more wave forces that batch
        spark.createDataFrame(
            [(999_998, "y1 y2 y3 y4 y5 y6 y7 y8 y9", "2024-03-03 01:00:00")],
            "doc_id long, text string, ts string",
        ).select(
            "doc_id", "text", F.to_timestamp("ts").alias("ts")
        ).write.parquet(str(feed / "w4"))
        q.processAllAvailable()
        assert q.exception() is None
        got = {
            r.doc_id: r.n_overlapping_shingles
            for r in spark.sql("SELECT * FROM t_decontam").collect()
        }
    finally:
        q.stop()

    want = {
        r.doc_id: r.n_overlapping_shingles
        for r in decontaminate(
            train, eval_df, "doc_id", "text", n=8
        ).collect()
    }
    assert got == want
    assert len(want) > 0  # the corpus genuinely contains contamination
