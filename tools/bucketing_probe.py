"""Bucketed co-located join probe: one-time clustering write cost vs
per-query shuffle savings, on a 10x key-remapped replica of sf0.1
(the join is too cheap at sf0.1 itself for wall-clock to resolve).

Each replica i remaps the order key to ``key + i * (max_key + 1)`` on
BOTH tables, preserving join selectivity while growing both sides 10x.

Usage: python tools/bucketing_probe.py [sf_dir] [replicas]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from sec_edgar_spark.catalog import table  # noqa: E402
from sec_edgar_spark.operators.bucketing import (  # noqa: E402
    drop_bucketed,
    write_bucketed,
)
from sec_edgar_spark.session import get_spark  # noqa: E402


def _replicate(df: DataFrame, key: str, n: int, max_key: int) -> DataFrame:
    rep = df.crossJoin(
        df.sparkSession.range(n).select(F.col("id").alias("_rep"))
    )
    return rep.withColumn(
        key, F.col(key) + F.col("_rep") * (max_key + 1)
    ).drop("_rep")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_rep = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="bucketing-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    d = tempfile.mkdtemp(prefix="bucketing_probe_")

    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    mk = orders.agg(F.max("o_orderkey")).collect()[0][0]
    orders10 = _replicate(orders, "o_orderkey", n_rep, mk)
    lineitem10 = _replicate(lineitem, "l_orderkey", n_rep, mk)

    # Materialize the replicas as plain parquet so the plain-join arm
    # reads files, not a crossJoin pipeline (fair comparison).
    orders10.write.mode("overwrite").parquet(d + "/plain_o")
    lineitem10.write.mode("overwrite").parquet(d + "/plain_l")
    plain_o = spark.read.parquet(d + "/plain_o")
    plain_l = spark.read.parquet(d + "/plain_l")

    t0 = time.time()
    write_bucketed(
        plain_o, "probe_o", d + "/o", "o_orderkey", 32,
        sort_cols="o_orderkey",
    )
    write_bucketed(
        plain_l, "probe_l", d + "/l", "l_orderkey", 32,
        sort_cols="l_orderkey",
    )
    t_write = time.time() - t0

    def join_count(li, od) -> DataFrame:
        return li.join(
            od, F.col("l_orderkey") == F.col("o_orderkey")
        ).select("l_orderkey")

    def best3(df):
        best = float("inf")
        for _ in range(3):
            t = time.time()
            df.count()
            best = min(best, time.time() - t)
        return best

    t_plain = best3(join_count(plain_l, plain_o))
    t_bucketed = best3(join_count(spark.table("probe_l"), spark.table("probe_o")))

    plan = (
        join_count(spark.table("probe_l"), spark.table("probe_o"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    j_shuffles = sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )
    drop_bucketed(spark, "probe_o", "probe_l")
    print(
        f"replicas={n_rep} write={t_write:.2f}s "
        f"plain_join={t_plain:.2f}s bucketed_join={t_bucketed:.2f}s "
        f"speedup={t_plain / t_bucketed:.2f}x "
        f"bucketed_join_shuffles={j_shuffles}"
    )


if __name__ == "__main__":
    main()
