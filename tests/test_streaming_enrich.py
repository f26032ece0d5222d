"""Stream-static join: the enriched snapshot equals the batch
join+rollup over the same rows (same function both sides)."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.timeout(240)
@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present"
)
def test_enrich_stream_matches_batch(spark, tmp_path):
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.streaming.enrich_stream import (
        enrich_rollup,
        run_to_memory_sink,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "ts", "user_id", "event_type", "value"
    )
    cust = table(spark, SF_DIR, "customer")

    feed = tmp_path / "feed"
    ev.filter(F.dayofmonth("ts") <= 15).write.parquet(str(feed / "b1"))
    b2 = ev.filter(F.dayofmonth("ts") > 15)

    stream = (
        spark.readStream.schema(
            "ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "4")
        .option("recursiveFileLookup", "true")
        .parquet(str(feed))
    )
    q = run_to_memory_sink(stream, cust, query_name="t_enrich")
    try:
        q.processAllAvailable()
        b2.write.parquet(str(feed / "b2"))
        q.processAllAvailable()
        assert q.exception() is None

        got = {
            (r.segment, r.event_type): (r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM t_enrich").collect()
        }
        want = {
            (r.segment, r.event_type): (r.n_events, r.total_value)
            for r in enrich_rollup(ev, cust).collect()
        }
        assert got == want
        # every segment resolved (user_id range sits inside c_custkey)
        assert "UNKNOWN" not in {s for s, _ in got}
        assert len({s for s, _ in got}) >= 2
    finally:
        q.stop()
