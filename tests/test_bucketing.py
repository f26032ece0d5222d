"""Bucketed co-located join: the shuffle-elimination path for the
recurring cik-keyed joins (J1/J2) at mirror scale.

Writes orders/customer as cik-bucketed tables and asserts the join
plan contains NO shuffle exchange on either side — the physical
property that makes repeated per-company joins cheap at 100 TB.
"""

import pytest
from pyspark.sql import functions as F


@pytest.mark.timeout(300)
def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # (warehouse dir is static config; default ./spark-warehouse is
    # gitignored — tables are dropped in the finally block)
    orders = spark.range(1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 100).alias("cik")
    )
    customers = spark.range(100).select(
        F.col("id").alias("cik"), F.concat(F.lit("co"), F.col("id")).alias("name")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "cik").sortBy("cik")
        .saveAsTable("t_orders_bucketed")
    )
    (
        customers.write.mode("overwrite")
        .bucketBy(8, "cik").sortBy("cik")
        .saveAsTable("t_customers_bucketed")
    )
    # Disable auto-broadcast so the join would otherwise shuffle.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_orders_bucketed").join(
            spark.table("t_customers_bucketed"), "cik"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_customers_bucketed")
