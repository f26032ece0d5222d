"""Stream-stream interval join: batch/stream parity on the same rows."""

import datetime as dt

import pytest

from sec_edgar_spark.operators.interval import range_join
from sec_edgar_spark.streaming.join_stream import interval_join_stream


def _ts(s):
    return dt.datetime.fromisoformat(s)


LEFT_ROWS = [
    (1, "k1", _ts("2024-01-01T10:00:00")),
    (2, "k1", _ts("2024-01-01T12:00:00")),
    (3, "k2", _ts("2024-01-01T10:00:00")),
]
RIGHT_ROWS = [
    (100, "k1", _ts("2024-01-01T09:30:00")),   # boundary: in
    (101, "k1", _ts("2024-01-01T09:29:59")),   # out
    (102, "k1", _ts("2024-01-01T10:00:00")),   # same instant
    (103, "k1", _ts("2024-01-01T10:29:00")),   # in, crosses bin edge
    (104, "k2", _ts("2024-01-01T10:01:00")),   # in, other key
]
L_SCHEMA = "lid long, k string, ts timestamp"
R_SCHEMA = "rid long, k string, ts timestamp"


@pytest.mark.timeout(180)
def test_stream_matches_batch_range_join(spark, tmp_path):
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    spark.createDataFrame(LEFT_ROWS, L_SCHEMA).write.parquet(str(ldir))
    spark.createDataFrame(RIGHT_ROWS, R_SCHEMA).write.parquet(str(rdir))

    ls = spark.readStream.schema(L_SCHEMA).parquet(str(ldir))
    rs = spark.readStream.schema(R_SCHEMA).parquet(str(rdir))
    out = interval_join_stream(
        ls, rs, on="k", left_ts="ts", right_ts="ts", tolerance_s=1800
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_ivjoin")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.lid, r.rid_right)
            for r in spark.sql("SELECT * FROM t_ivjoin").collect()
        }
    finally:
        q.stop()

    batch = range_join(
        spark.createDataFrame(LEFT_ROWS, L_SCHEMA),
        spark.createDataFrame(RIGHT_ROWS, R_SCHEMA),
        on="k",
        left_ts="ts",
        right_ts="ts",
        tolerance_s=1800,
    )
    want = {(r.lid, r.rid_right) for r in batch.collect()}
    assert got == want == {(1, 100), (1, 102), (1, 103), (3, 104)}


@pytest.mark.timeout(180)
def test_plan_is_streaming_symmetric_join(spark, tmp_path):
    ldir, rdir = tmp_path / "l2", tmp_path / "r2"
    spark.createDataFrame(LEFT_ROWS, L_SCHEMA).write.parquet(str(ldir))
    spark.createDataFrame(RIGHT_ROWS, R_SCHEMA).write.parquet(str(rdir))
    ls = spark.readStream.schema(L_SCHEMA).parquet(str(ldir))
    rs = spark.readStream.schema(R_SCHEMA).parquet(str(rdir))
    out = interval_join_stream(
        ls, rs, on="k", left_ts="ts", right_ts="ts", tolerance_s=1800
    )
    assert out.isStreaming
    # both sides watermarked -> bounded state
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
