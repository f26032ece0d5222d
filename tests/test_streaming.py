"""Streaming daily-feed tests: batch/stream parity on the same files."""

import shutil
import time

import pytest

from sec_edgar_spark.sources.index import read_master_idx
from sec_edgar_spark.streaming.daily_feed import run_to_memory_sink


@pytest.mark.timeout(180)
def test_stream_matches_batch(spark, data_dir, tmp_path):
    watch = tmp_path / "feed"
    watch.mkdir()
    src = f"{data_dir}/daily-index/2024/QTR1/master.20240115.idx"
    shutil.copy(src, watch / "master.20240115.idx")

    q = run_to_memory_sink(spark, str(watch), query_name="t_rollup")
    try:
        q.processAllAvailable()
        got = {
            (str(r.day), r.form_type): r.n_filings
            for r in spark.sql("SELECT * FROM t_rollup").collect()
        }
        # batch truth
        batch = read_master_idx(spark, src).groupBy("date_filed", "form_type").count()
        want = {
            (str(r.date_filed), r.form_type): r["count"] for r in batch.collect()
        }
        assert got == want

        # second file arrives -> incremental update
        with open(watch / "master.20240116.idx", "w") as f:
            f.write("CIK|Company Name|Form Type|Date Filed|Filename\n")
            f.write("------\n")
            f.write("99|LATE CO|8-K|20240116|edgar/data/99/0000000099-24-000001.txt\n")
        q.processAllAvailable()
        got2 = {
            (str(r.day), r.form_type): r.n_filings
            for r in spark.sql("SELECT * FROM t_rollup").collect()
        }
        assert got2[("2024-01-16", "8-K")] == 1
        assert set(want.items()).issubset(set(got2.items()))
    finally:
        q.stop()
