"""Window-function breadth + CUBE + max-per-group join shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..catalog import table
from .registry import query


def _dec(c, prec: int = 12, scale: int = 2):
    return c.cast(f"decimal({prec},{scale})")


@query(
    "window_rank_lag_lead",
    oracle="""
    SELECT o_orderkey, o_custkey,
      CAST(RANK() OVER w AS BIGINT) AS rnk,
      CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
      LAG(o_orderkey) OVER w AS prev_order,
      LEAD(o_orderkey) OVER w AS next_order,
      FIRST_VALUE(o_orderkey) OVER w AS first_order
    FROM orders
    WHERE o_custkey % 10 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_rank_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / lag / lead / first_value over one window."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
            F.first("o_orderkey").over(w).alias("first_order"),
        )
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
        RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS spend_30d
    FROM orders WHERE o_custkey % 25 = 0
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time (trailing 30-day spend per customer)
    — the time-window frame the reference never had but any analytics
    user of the filing index needs."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 25 == 0)
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double").alias("spend_30d"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations)."""
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")
    )


@query(
    "q2_max_per_group_join",
    oracle="""
    SELECT p.p_brand, p.p_partkey, p.p_retailprice
    FROM part p
    JOIN (
      SELECT p_brand, MAX(p_retailprice) AS mx FROM part GROUP BY p_brand
    ) m ON p.p_brand = m.p_brand AND p.p_retailprice = m.mx
    ORDER BY p.p_brand, p.p_partkey
    """,
)
def q2_max_per_group_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-max shape: aggregate-then-rejoin (the
    decorrelated plan Catalyst produces for the scalar subquery)."""
    p = table(spark, sf_dir, "part")
    m = p.groupBy(F.col("p_brand").alias("m_brand")).agg(
        F.max("p_retailprice").alias("mx")
    )
    return (
        p.join(
            m,
            (p.p_brand == m.m_brand) & (p.p_retailprice == m.mx),
        )
        .select("p_brand", "p_partkey", "p_retailprice")
        .orderBy("p_brand", "p_partkey")
    )
