"""global_rank / parallel_ntile: exact equivalence to the builtin
single-partition window forms, on sizes that exercise every bucket
boundary case (n mod k == 0, < k, arbitrary)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sec_edgar_spark.operators.relational import global_rank, parallel_ntile


def _df(spark, n):
    # non-monotonic values with a unique tiebreak
    return spark.range(n).select(
        ((F.col("id") * 37) % 101).alias("v"), F.col("id").alias("tid")
    ).repartition(7)


def test_global_rank_matches_builtin(spark):
    df = _df(spark, 500)
    got = {
        (r.v, r.tid): r.rn for r in global_rank(df, ["v", "tid"]).collect()
    }
    w = Window.orderBy("v", "tid")
    want = {
        (r.v, r.tid): r.rn
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(500, 8), (504, 8), (5, 8), (100, 7)])
def test_parallel_ntile_matches_builtin(spark, n, k):
    df = _df(spark, n)
    got = {
        (r.v, r.tid): r.bucket
        for r in parallel_ntile(df, ["v", "tid"], k).collect()
    }
    w = Window.orderBy("v", "tid")
    want = {
        (r.v, r.tid): r.b
        for r in df.withColumn("b", F.ntile(k).over(w)).collect()
    }
    assert got == want


def test_global_rank_no_single_partition_window(spark):
    """The plan must not contain an empty-partition WindowExec over the
    data (the P-row offsets frame may window — that's P rows)."""
    df = _df(spark, 100)
    plan = (
        global_rank(df, ["v", "tid"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the data-sized window is partitioned by _pid
    assert "partitionspec=[_pid" in plan.replace(" ", "").lower() or "_pid" in plan


def test_grouped_weighted_cumsum_matches_naive_window(spark):
    """The two-phase grouped running sum equals the naive
    single-window-per-group form on a unique total order, across
    groups with very different sizes."""
    from sec_edgar_spark.operators.relational import grouped_weighted_cumsum

    rows = [
        ("a", i, (i * 7) % 5 + 1) for i in range(200)
    ] + [("b", i, (i * 3) % 4 + 1) for i in range(17)] + [("c", 0, 9)]
    df = spark.createDataFrame(rows, "g string, k long, w long")
    got = {
        (r.g, r.k): r.cw
        for r in grouped_weighted_cumsum(df, ["g"], ["k"], "w").collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.g, r.k): r.cw
        for r in df.withColumn("cw", F.sum("w").over(w)).collect()
    }
    assert got == want and len(got) == 218
