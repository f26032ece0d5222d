"""Streaming URL intake gate — batch/stream parity: streaming a URL
feed in waves must admit exactly one row per canonical URL, the same
canonical set the batch canonicalizer produces, with the known-ledger
anti join removing already-crawled canonicals."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present"
)


def _url_feed(spark):
    """The batch query's synthetic URL corpus (customer-key derived)."""
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").select("c_custkey")
    url = F.concat(
        F.when(F.col("c_custkey") % 3 == 0, F.lit("HTTPS://Site")).otherwise(
            F.lit("https://site")
        ),
        (F.col("c_custkey") % 20).cast("string"),
        F.lit(".Example.com/item/"),
        (F.col("c_custkey") % 100).cast("string"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.concat(
                F.lit("?utm_source=feed&utm_campaign=q"),
                (F.col("c_custkey") % 3).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("#frag")).otherwise(
            F.lit("")
        ),
    )
    return c.select(
        F.col("c_custkey").alias("url_id"),
        url.alias("url"),
        F.to_timestamp(F.lit("2024-03-01 12:00:00")).alias("ts"),
    )


def test_url_intake_stream_matches_batch(spark, tmp_path):
    from sec_edgar_spark.functions.text import canonicalize_url
    from sec_edgar_spark.streaming.url_intake import url_intake_stream

    feed_df = _url_feed(spark)
    batch_canon = feed_df.select(
        canonicalize_url("url").alias("canonical_url")
    )
    known = batch_canon.distinct().limit(20).cache()
    expected = {
        r.canonical_url
        for r in batch_canon.distinct().join(
            known, "canonical_url", "left_anti"
        ).collect()
    }

    feed = tmp_path / "feed"
    feed_df.filter(F.col("url_id") % 2 == 0).write.parquet(str(feed / "w1"))
    feed_df.filter(F.col("url_id") % 2 == 1).write.parquet(str(feed / "w2"))
    stream = (
        spark.readStream.schema("url_id long, url string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed) + "/*")
    )
    out = url_intake_stream(stream, known_canonicals=known)
    q = (
        out.writeStream.format("memory")
        .queryName("t_url_intake")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT canonical_url, COUNT(*) AS n FROM t_url_intake GROUP BY 1"
    ).collect()
    known.unpersist()
    # exactly one admitted row per canonical, and exactly the batch set
    assert all(r.n == 1 for r in got)
    assert {r.canonical_url for r in got} == expected
