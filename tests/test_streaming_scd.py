"""Streaming SCD2 maintenance: closed ∪ current after ordered waves of
the real events parquet equals the one-shot batch build; the closed
store is append-only (no rewrite amplification)."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_scd2_stream_matches_batch_build(spark, tmp_path):
    from sec_edgar_spark.operators.scd import scd2_build
    from sec_edgar_spark.streaming.scd_stream import (
        read_dim,
        run_scd2_maintenance,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    feed = tmp_path / "feed"
    root = str(tmp_path / "dim")
    # three event-time-ordered waves (the daily-delta contract)
    ev.filter(F.dayofmonth("ts") <= 10).write.parquet(str(feed / "b1"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1000")
        .parquet(str(feed) + "/*")
    )
    q = run_scd2_maintenance(
        stream, root, checkpoint=str(tmp_path / "ckpt"), query_name="t_scd2"
    )
    try:
        q.processAllAvailable()
        ev.filter(
            (F.dayofmonth("ts") > 10) & (F.dayofmonth("ts") <= 20)
        ).write.parquet(str(feed / "b2"))
        q.processAllAvailable()
        ev.filter(F.dayofmonth("ts") > 20).write.parquet(str(feed / "b3"))
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    got = {
        (r.user_id, r.status, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in read_dim(spark, root).collect()
    }
    want = {
        (r.user_id, r.status, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in scd2_build(ev).collect()
    }
    assert got == want
    # exactly one current row per user
    cur = spark.read.parquet(f"{root}/current")
    n_users = ev.select("user_id").distinct().count()
    assert cur.count() == n_users
    assert cur.filter(~F.col("is_current")).count() == 0
