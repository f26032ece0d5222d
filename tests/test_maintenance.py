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


def test_compaction_recovers_stale_backup(spark, tmp_path):
    """Crash between the two renames (backup exists, path missing):
    the next run must restore the backup — the data — before
    compacting (ADVICE r5)."""
    import os

    path = str(tmp_path / "t3")
    spark.range(1000).repartition(8).write.parquet(path)
    before = set(r.id for r in spark.read.parquet(path).collect())
    # simulate the crash window: path renamed away, swap never finished
    os.rename(path, path + ".pre-compact")
    # plus a half-written staging dir from the crashed attempt
    os.makedirs(path + ".compacting")
    with open(path + ".compacting/part-junk.parquet", "w") as fh:
        fh.write("not parquet")
    _, total = dir_stats(path + ".pre-compact")
    n_after = compact_parquet(spark, path, target_bytes=total)
    assert n_after >= 1
    after = set(r.id for r in spark.read.parquet(path).collect())
    assert after == before
    assert not os.path.exists(path + ".pre-compact")
    assert not os.path.exists(path + ".compacting")


def test_compaction_cleans_completed_swap_residue(spark, tmp_path):
    """Crash after the swap but before backup cleanup (both dirs
    exist): path already holds the new layout — keep it, drop the
    backup."""
    import os

    path = str(tmp_path / "t4")
    spark.range(500).coalesce(1).write.parquet(path)
    keep = set(r.id for r in spark.read.parquet(path).collect())
    # stale backup with DIFFERENT (old) content
    spark.range(5).coalesce(1).write.parquet(path + ".pre-compact")
    _, total = dir_stats(path)
    compact_parquet(spark, path, target_bytes=max(total, 1))
    assert not os.path.exists(path + ".pre-compact")
    assert set(r.id for r in spark.read.parquet(path).collect()) == keep
