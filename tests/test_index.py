"""Index-scan golden tests (S1/S2/F1/F2 + date normalization C8)."""

import datetime

from pyspark.sql import functions as F

from sec_edgar_spark.sources.index import (
    daily_idx_path,
    quarterly_idx_path,
    read_master_idx,
)


def test_quarterly_scan_drops_header_and_projects(spark, data_dir):
    df = read_master_idx(spark, f"{data_dir}/full-index/1996/QTR4/master.idx")
    rows = df.orderBy("line_no").collect()
    assert len(rows) == 7  # banner + separator rows dropped
    first = rows[0]
    assert first.cik == 320193
    assert first.company_name == "APPLE COMPUTER INC"
    assert first.form_type == "10-K"
    assert first.date_filed == datetime.date(1996, 12, 19)
    assert first.file_name == "edgar/data/320193/0000320193-96-000023.txt"
    assert first.path == "Archives/edgar/data/320193/0000320193-96-000023.txt"
    assert first.accession_number == "0000320193-96-000023"


def test_daily_scan_normalizes_yyyymmdd_dates(spark, data_dir):
    df = read_master_idx(
        spark, f"{data_dir}/daily-index/2024/QTR1/master.20240115.idx"
    )
    rows = df.collect()
    assert len(rows) == 3
    assert all(r.date_filed == datetime.date(2024, 1, 15) for r in rows)


def test_both_shapes_union(spark, data_dir):
    df = read_master_idx(
        spark,
        [
            f"{data_dir}/full-index/1996/QTR4/master.idx",
            f"{data_dir}/daily-index/2024/QTR1/master.20240115.idx",
        ],
    )
    assert df.count() == 10
    # line_no is the raw file position: contiguous per file, restarting
    # per source file (header lines occupy the low positions)
    per_file = df.groupBy("source_file").agg(
        F.min("line_no").alias("mn"),
        F.max("line_no").alias("mx"),
        F.count("*").alias("n"),
    ).collect()
    for r in per_file:
        assert r.mx - r.mn + 1 == r.n  # contiguous data block per file


def test_line_order_matches_file_order(spark, data_dir):
    df = read_master_idx(spark, f"{data_dir}/full-index/1996/QTR4/master.idx")
    got = [r.accession_number for r in df.orderBy("line_no").collect()]
    assert got[0] == "0000320193-96-000023"
    assert got[-1] == "0000040545-96-000110"


def test_era_dependent_daily_paths():
    base = "mirror"
    assert (
        daily_idx_path(base, datetime.date(1994, 7, 1))
        == "mirror/daily-index/1994/QTR3/master.070194.idx"
    )
    assert (
        daily_idx_path(base, datetime.date(1997, 1, 2))
        == "mirror/daily-index/1997/QTR1/master.970102.idx"
    )
    assert (
        daily_idx_path(base, datetime.date(2024, 1, 15))
        == "mirror/daily-index/2024/QTR1/master.20240115.idx"
    )
    assert quarterly_idx_path(base, 1996, 4) == "mirror/full-index/1996/QTR4/master.idx"


def test_upsert_mirror_is_idempotent_and_partition_scoped(spark, tmp_path):
    from pyspark.sql import functions as F

    from sec_edgar_spark.sources.index import (
        read_master_idx,
        to_parquet_mirror,
        upsert_parquet_mirror,
    )

    idx = read_master_idx(spark, "tests/data/full-index/1996/QTR4/master.idx")
    dest = str(tmp_path / "mirror")
    to_parquet_mirror(idx, dest)
    base = spark.read.parquet(dest).count()

    # Re-upserting the SAME quarter must converge, not duplicate.
    upsert_parquet_mirror(idx, dest)
    assert spark.read.parquet(dest).count() == base

    # Upserting a shifted copy (different year) adds that partition
    # without touching 1996.
    shifted = idx.withColumn("date_filed", F.add_months("date_filed", 12))
    upsert_parquet_mirror(shifted, dest)
    after = spark.read.parquet(dest)
    assert after.count() == base * 2
    assert set(after.select("year").distinct().toPandas()["year"]) == {1996, 1997}
    assert after.filter(F.col("year") == 1996).count() == base
