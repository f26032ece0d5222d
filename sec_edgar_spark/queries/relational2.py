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
    "scalar_battery2",
    oracle="""
    SELECT o_orderkey,
      translate(o_orderpriority, '-', '_') AS pri_translated,
      reverse(o_orderstatus) AS status_rev,
      repeat(o_orderstatus, 3) AS status_x3,
      left(o_orderpriority, 1) AS pri_code,
      right(o_orderpriority, 3) AS pri_tail,
      CAST(strpos(o_orderpriority, '-') AS INT) AS dash_pos,
      rpad(o_orderstatus, 4, '.') AS status_padded,
      last_day(CAST(o_orderdate AS DATE)) AS month_end,
      CAST(o_orderdate AS DATE) + INTERVAL 45 DAY AS plus_45d,
      CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
        AS days_since_epoch_start,
      CAST(abs(o_totalprice - 150000) AS DOUBLE) AS abs_delta,
      CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_k_ceil,
      CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k_floor,
      CAST(sign(o_totalprice - 150000) AS DOUBLE) AS delta_sign,
      CAST(o_orderkey % 7 AS BIGINT) AS key_mod7
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def scalar_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second scalar battery: string surgery (translate/reverse/repeat/
    left/right/strpos/rpad), calendar math (last_day, interval add,
    datediff), and exact numeric scalars (abs/ceil/floor/sign/mod).
    Transcendentals are deliberately excluded — libm last-ulp results
    are not engine-portable; sqrt (IEEE-exact) is covered by cosine."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.translate("o_orderpriority", "-", "_").alias("pri_translated"),
        F.reverse("o_orderstatus").alias("status_rev"),
        F.repeat("o_orderstatus", 3).alias("status_x3"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.substring(F.col("o_orderpriority"), -3, 3).alias("pri_tail"),
        F.instr("o_orderpriority", "-").cast("int").alias("dash_pos"),
        F.rpad("o_orderstatus", 4, ".").alias("status_padded"),
        F.last_day(d).alias("month_end"),
        F.date_add(d, 45).alias("plus_45d"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("int").alias(
            "days_since_epoch_start"
        ),
        F.abs(F.col("o_totalprice") - 150000).alias("abs_delta"),
        F.ceil(F.col("o_totalprice") / 1000).cast("bigint").alias("price_k_ceil"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_k_floor"),
        F.signum(F.col("o_totalprice") - 150000).alias("delta_sign"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod7"),
    )


@query(
    "setop_bag_semantics",
    oracle="""
    SELECT 'intersect_all' AS op, COUNT(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'except_all' AS op, COUNT(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def setop_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL multiset semantics."""
    o = table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_custkey"
    )
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    ia = hi.intersectAll(open_).agg(F.count("*").alias("n")).select(
        F.lit("intersect_all").alias("op"), "n"
    )
    ea = hi.exceptAll(open_).agg(F.count("*").alias("n")).select(
        F.lit("except_all").alias("op"), "n"
    )
    return ia.unionByName(ea)


@query(
    "j_full_outer",
    oracle="""
    SELECT COALESCE(a.k, b.k) AS user_key,
      COALESCE(a.n_click, 0) AS n_click, COALESCE(b.n_err, 0) AS n_err
    FROM (SELECT user_id AS k, COUNT(*) AS n_click FROM events
          WHERE event_type = 'click' GROUP BY 1) a
    FULL OUTER JOIN
         (SELECT user_id AS k, COUNT(*) AS n_err FROM events
          WHERE event_type = 'error' GROUP BY 1) b
      ON a.k = b.k
    """,
)
def j_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two pre-reduced aggregates with COALESCE keys."""
    e = table(spark, sf_dir, "events")
    a = (
        e.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("ak"))
        .agg(F.count("*").alias("n_click"))
    )
    b = (
        e.filter(F.col("event_type") == "error")
        .groupBy(F.col("user_id").alias("bk"))
        .agg(F.count("*").alias("n_err"))
    )
    return a.join(b, a.ak == b.bk, "full_outer").select(
        F.coalesce("ak", "bk").alias("user_key"),
        F.coalesce("n_click", F.lit(0)).alias("n_click"),
        F.coalesce("n_err", F.lit(0)).alias("n_err"),
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
    "agg_percentiles_approx",
    oracle="""
    SELECT l_returnflag,
      quantile_disc(l_extendedprice, 0.5) AS p50,
      quantile_disc(l_extendedprice, 0.9) AS p90,
      CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for percentiles: ``percentile_approx`` (GK
    sketch) over the FULL table — mergeable map-side partials, bounded
    memory per group, no per-group value buffering (the exact variant
    above needed a key-sample to stay feasible; this one doesn't).

    Oracle parity: both engines return a discrete order statistic
    (an actual data value).  At gate scale the group sizes (~20k) are
    far below the sketch accuracy (1e6), so the GK summary is exact
    and matches DuckDB's ``quantile_disc`` element-for-element
    (verified empirically at sf0.01).  At 100 TB the same operator
    degrades gracefully to a 1e-6 relative-rank error instead of
    OOMing.
    """
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000000).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.9, 1000000).alias("p90"),
        F.count("*").alias("n"),
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


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
      CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) + grouping()
    markers — one aggregation pass emitting three grouping shapes."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("t_orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
          COUNT(*) AS n,
          CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
          CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st
        FROM t_orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "window_distribution",
    oracle="""
    SELECT o_orderkey,
      CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      percent_rank() OVER w AS pr,
      cume_dist() OVER w AS cd
    FROM orders
    WHERE o_custkey <= 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank /
    cume_dist) with a total-order tiebreak so both engines rank
    identically."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT o_orderstatus,
      CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS urgent,
      CAST(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS high,
      CAST(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS medium
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) via groupBy().pivot() with an explicit
    value list — Catalyst plans it as ONE aggregation with conditional
    partials, exactly the CASE-sum formulation the oracle writes out
    (an unlisted-values pivot would need an extra distinct pass; always
    list values at scale)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .count()
        .select(
            "o_orderstatus",
            F.coalesce(F.col("1-URGENT"), F.lit(0)).alias("urgent"),
            F.coalesce(F.col("2-HIGH"), F.lit(0)).alias("high"),
            F.coalesce(F.col("3-MEDIUM"), F.lit(0)).alias("medium"),
        )
    )


@query(
    "scalar_array_battery",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, range(1, (o_orderkey % 10) + 2) AS xs
      FROM orders WHERE o_custkey <= 30
    )
    SELECT o_orderkey,
      array_to_string(list_transform(xs, x -> x * 2), ',') AS doubled,
      coalesce(array_to_string(list_filter(xs, x -> x % 2 = 0), ','), '') AS evens,
      CAST(len(list_filter(xs, x -> x > 5)) > 0 AS BOOLEAN) AS has_gt5,
      CAST(len(list_filter(xs, x -> x <= 10)) = len(xs) AS BOOLEAN) AS all_le10,
      CAST(list_sum(xs) AS BIGINT) AS total,
      array_to_string(list_reverse_sort(xs), ',') AS sorted_desc,
      coalesce(array_to_string(list_sort(list_distinct(list_concat(xs, xs))), ','), '') AS dedup_concat,
      coalesce(array_to_string(xs[2:3], ','), '') AS middle_slice,
      CAST(list_position(xs, 3) AS INT) AS pos_of_3
    FROM t
    """,
)
def scalar_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array surface in one row-parallel pass: transform,
    filter, exists, forall, aggregate(fold), reverse sort, distinct,
    slice, position — all codegen'd lambdas, the array vocabulary the
    XBRL/embedding pipelines compose from.  DuckDB's list_* functions
    mirror each (1-based slicing aligned on both sides)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 30)
    xs = F.sequence(F.lit(1).cast("long"), (F.col("o_orderkey") % 10) + 1)
    t = o.select("o_orderkey", xs.alias("xs"))
    # Array outputs serialize with array_join on BOTH sides: the
    # comparator stringifies cells, and numpy vs list reprs differ.
    return t.select(
        "o_orderkey",
        F.array_join(F.transform("xs", lambda x: x * 2), ",").alias("doubled"),
        F.array_join(F.filter("xs", lambda x: x % 2 == 0), ",").alias("evens"),
        F.exists("xs", lambda x: x > 5).alias("has_gt5"),
        F.forall("xs", lambda x: x <= 10).alias("all_le10"),
        F.aggregate(
            "xs", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total"),
        F.array_join(F.reverse(F.array_sort("xs")), ",").alias("sorted_desc"),
        F.array_join(F.array_sort(F.array_distinct(F.concat("xs", "xs"))), ",").alias("dedup_concat"),
        F.array_join(F.slice("xs", 2, 2), ",").alias("middle_slice"),
        F.array_position("xs", 3).cast("int").alias("pos_of_3"),
    )


@query(
    "scalar_map_battery",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
        map(['pri', 'status'], [o_orderpriority, o_orderstatus]) AS m
      FROM orders WHERE o_custkey <= 20
    )
    SELECT o_orderkey,
      array_to_string(map_keys(m), ',') AS keys_joined,
      array_to_string(map_values(m), ',') AS vals_joined,
      m['pri'][1] AS pri_lookup,
      CAST(cardinality(m) AS INT) AS n_entries,
      array_to_string(
        map_values(map_concat(m, map(['extra'], ['x']))), ','
      ) AS merged_vals
    FROM t
    """,
)
def scalar_map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface in one pass: construct (map_from_arrays), keys/
    values (insertion-ordered in both engines), key lookup, size,
    map_concat — the vocabulary the SGML-metadata and XBRL map-of-maps
    pipelines build on."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    m = F.map_from_arrays(
        F.array(F.lit("pri"), F.lit("status")),
        F.array(F.col("o_orderpriority"), F.col("o_orderstatus")),
    )
    t = o.select("o_orderkey", m.alias("m"))
    merged = F.map_concat(
        F.col("m"), F.map_from_arrays(F.array(F.lit("extra")), F.array(F.lit("x")))
    )
    return t.select(
        "o_orderkey",
        F.array_join(F.map_keys("m"), ",").alias("keys_joined"),
        F.array_join(F.map_values("m"), ",").alias("vals_joined"),
        F.element_at("m", "pri").alias("pri_lookup"),
        F.size("m").cast("int").alias("n_entries"),
        F.array_join(F.map_values(merged), ",").alias("merged_vals"),
    )


@query(
    "q4_late_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted to this schema's columns): orders with
    at least one lineitem shipped 60+ days after the order date —
    correlated EXISTS as a LEFT SEMI join whose condition mixes the
    orderkey equi-key with the correlated date range.  The semi join
    shuffles once on orderkey and short-circuits per order (no
    count/distinct needed to dedup multiple late lines).
    """
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@query(
    "q16_never_shipped",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts,
      CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_partkey = p.p_partkey
        AND l.l_shipdate < TIMESTAMP '1996-01-01'
    )
    GROUP BY p_brand
    """,
)
def q16_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted): dead-stock report — parts with no
    shipment in the window (none before 1996 here), per brand with
    distinct-type counts.  NOT
    EXISTS is a LEFT ANTI join on partkey; at scale the lineitem side
    reduces to its distinct partkeys BEFORE the join (explicit
    distinct keeps the anti join's build side minimal instead of
    probing the full fact table).
    """
    p = table(spark, sf_dir, "part")
    shipped = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        .select("l_partkey")
        .distinct()
    )
    dead = p.join(
        shipped, p["p_partkey"] == shipped["l_partkey"], "left_anti"
    )
    return dead.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.countDistinct("p_type").cast("bigint").alias("n_types"),
    )


@query(
    "audit_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk, COUNT(*) AS n_orphans FROM (
      SELECT l_orderkey FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    )
    UNION ALL
    SELECT 'orders.o_custkey->customer', COUNT(*) FROM (
      SELECT o_custkey FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    UNION ALL
    SELECT 'customer.c_nationkey->nation', COUNT(*) FROM (
      SELECT c_nationkey FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    )
    UNION ALL
    SELECT 'supplier.s_nationkey->nation', COUNT(*) FROM (
      SELECT s_nationkey FROM supplier s
      WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
    )
    """,
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table FK orphan audit — the data-quality gate a pipeline
    runs before joining anything: one LEFT ANTI join per foreign key,
    counted, unioned into a single report.  Dimension-side keys
    broadcast; the fact-side anti joins are the only shuffles and each
    carries just the FK column (pruned scan).  All-zero counts on
    healthy data is the assertion; the query stays cheap enough to run
    per ingest batch at any scale.
    """
    from pyspark.sql.functions import broadcast

    def orphans(label, fact, fk, dim, pk, bcast_dim=True):
        f = table(spark, sf_dir, fact).select(F.col(fk))
        d = table(spark, sf_dir, dim).select(F.col(pk))
        if bcast_dim:
            d = broadcast(d)
        return (
            f.join(d, f[fk] == d[pk], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    return (
        orphans("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
                "orders", "o_orderkey", bcast_dim=False)
        .unionByName(orphans("orders.o_custkey->customer", "orders",
                             "o_custkey", "customer", "c_custkey"))
        .unionByName(orphans("customer.c_nationkey->nation", "customer",
                             "c_nationkey", "nation", "n_nationkey"))
        .unionByName(orphans("supplier.s_nationkey->nation", "supplier",
                             "s_nationkey", "nation", "n_nationkey"))
    )


@query(
    "q7_nation_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
           AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume through a 6-way
    join with TWO role-playing copies of the nation dimension
    (customer's vs supplier's).  The fact side shuffles once per fact
    key (orderkey, then custkey/suppkey chains); every dimension —
    customer, supplier, and both nation roles — broadcasts, so the
    deep join tree is one scan + hash probes.  The asymmetric filter
    (different nations) lands post-join on broadcast columns.
    """
    from pyspark.sql.functions import broadcast

    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    one_minus = (F.lit(1) - disc).cast("decimal(4,2)")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.sum(price * one_minus).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )
