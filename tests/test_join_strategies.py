"""Physical join-strategy control: the engine must let a pipeline pin
broadcast / shuffle-hash / sort-merge per join (the 100 TB lever when
AQE's estimates are wrong), and auto-broadcast small dims."""

from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _tables(spark):
    big = spark.range(0, 10000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    dim = spark.range(0, 50).select(F.col("id").alias("k"), F.lit("d").alias("name"))
    return big, dim


def test_broadcast_hint_forces_bhj(spark):
    big, dim = _tables(spark)
    plan = _plan(big.join(dim.hint("broadcast"), "k"))
    assert "BroadcastHashJoin" in plan


def test_merge_hint_forces_smj(spark):
    big, dim = _tables(spark)
    plan = _plan(big.join(dim.hint("merge"), "k"))
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_shuffle_hash_hint_forces_shj(spark):
    big, dim = _tables(spark)
    plan = _plan(big.join(dim.hint("shuffle_hash"), "k"))
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_small_dim_auto_broadcasts(spark):
    """Under the default 10MB threshold a 50-row dim must broadcast
    without any hint — the free plan Catalyst should pick."""
    big, dim = _tables(spark)
    plan = _plan(big.join(dim, "k"))
    assert "BroadcastHashJoin" in plan
