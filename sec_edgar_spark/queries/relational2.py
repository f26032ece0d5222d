"""Window-function breadth + CUBE + max-per-group join shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast

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
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + conjunctive pushed filters + scalar agg —
    the whole query is one codegen'd stage with zero shuffle rows."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount"), 4, 2))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q14_conditional_agg",
    oracle="""
    SELECT
      100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE)
        AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: CASE-inside-aggregate over a fact↔dim join (part
    broadcasts); division of two exact sums in double."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = _dec(F.col("l_extendedprice")) * _dec(
        F.lit(1) - _dec(F.col("l_discount"), 4, 2), 4, 2
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    joined = l.join(broadcast(p), l.l_partkey == p.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      CAST(big.sum_qty AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 120
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-HAVING as the driving semi-selective
    input to subsequent joins (the reduced side joins first)."""
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 120)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
      quantile_cont(l_extendedprice, 0.5) AS p50,
      quantile_cont(l_extendedprice, 0.9) AS p90,
      CAST(MIN(l_extendedprice) AS DOUBLE) AS mn,
      CAST(MAX(l_extendedprice) AS DOUBLE) AS mx
    FROM lineitem WHERE l_orderkey % 10 = 0 GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (median/p90) per group — both
    engines use linear interpolation on sorted doubles; parity verified
    empirically (same IEEE results).

    Exact percentile buffers every value per group (142s at 6M rows in
    the 10× probe), so it runs on a deterministic key-sample here — the
    honest full-data path at scale is approx_percentile (t-digest
    sketch, mergeable map-side), which has no cross-engine oracle.
    """
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.9).alias("p90"),
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
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
