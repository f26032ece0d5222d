"""Streaming partitioned-parquet sink: layout, content parity with the
source, and replay idempotence (the at-least-once duplication the
plain append sink would exhibit)."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.timeout(240)
@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present"
)
def test_partitioned_sink_layout_content_and_replay(spark, tmp_path):
    from sec_edgar_spark.streaming.parquet_sink import (
        start_partitioned_parquet_sink,
    )

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "ts", "event_type", "value")
        .withColumn("day", F.to_date("ts"))
        .filter(F.dayofmonth("ts") <= 4)
    )
    feed = tmp_path / "feed"
    # one file per day -> partition-aligned batches with maxFilesPerTrigger=1
    for d in (1, 2, 3, 4):
        ev.filter(F.dayofmonth("ts") == d).coalesce(1).write.parquet(
            str(feed / f"d{d}")
        )

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, "
            "value double, day date"
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(feed))
    )
    dest = str(tmp_path / "lake")
    q = start_partitioned_parquet_sink(
        stream,
        dest,
        partition_cols=["day"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        sort_cols=["event_id"],
        query_name="t_lake",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # hive-style day= partition directories exist
    parts = sorted(p for p in os.listdir(dest) if p.startswith("day="))
    assert len(parts) == 4, parts

    got = spark.read.parquet(dest)
    want = ev
    assert got.count() == want.count()
    assert (
        got.select("event_id").sort("event_id").collect()
        == want.select("event_id").sort("event_id").collect()
    )
    # partition pruning: the day filter lands in PartitionFilters (file
    # listing pruned before the scan), not a post-scan data filter
    plan = (
        got.filter(F.col("day") == "2024-01-02")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "2024-01-02" in plan, plan

    # replay: re-running the SAME partition-aligned feed with a fresh
    # checkpoint converges to the same content (dynamic overwrite),
    # where an append sink would have doubled every row
    q2 = start_partitioned_parquet_sink(
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, "
            "value double, day date"
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(feed)),
        dest,
        partition_cols=["day"],
        checkpoint_dir=str(tmp_path / "ckpt2"),
        sort_cols=["event_id"],
        query_name="t_lake_replay",
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(dest).count() == want.count()
