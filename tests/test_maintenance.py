"""compact_parquet: fewer files, identical content, safe swap."""

from pyspark.sql import functions as F

from sec_edgar_spark.operators.maintenance import compact_parquet, dir_stats


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    # 64 tiny files
    spark.range(10000).select(
        "id", (F.col("id") % 5).alias("g")
    ).repartition(64).write.parquet(path)
    n_before, total = dir_stats(path)
    assert n_before >= 64
    before = set(
        (r.id, r.g) for r in spark.read.parquet(path).collect()
    )
    n_after = compact_parquet(spark, path, target_bytes=total)
    assert n_after < n_before
    assert n_after <= 2  # everything fits one target-size file (+slack)
    after = set((r.id, r.g) for r in spark.read.parquet(path).collect())
    assert after == before


def test_compaction_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(100).coalesce(1).write.parquet(path)
    n_before, total = dir_stats(path)
    assert compact_parquet(spark, path, target_bytes=max(total, 1)) == n_before
