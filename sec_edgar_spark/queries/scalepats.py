"""Scale-pattern battery: the shuffle-volume / iterative-algorithm
shapes a 100 TB deployment leans on, each oracle-checked.

- Bloom-prefiltered semi-join (runtime-filter pattern, explicit and
  reusable): prune the fact scan before the shuffle when the dim is
  too big to broadcast as a hash relation but its Bloom filter isn't.
- Integer PageRank: iterative rank scoring made engine-replayable by
  doing every operation in non-negative BIGINT micro-units (floating
  PageRank can never be value-checked across engines — sum order).
- Interval sweep (max concurrency): the +1/-1 event-sweep that
  replaces the quadratic interval self-join.
- Seasonal baseline anomaly screen: two-pass filter-by-aggregate with
  exact-decimal moment sums so mean/variance are order-independent.

Determinism rules follow the registry docstring: exact DECIMAL or
BIGINT accumulation, DOUBLE only for final arithmetic on already-exact
operands, md5-only hashing, total-order tiebreaks on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast

from ..catalog import table
from ..operators.bloom import bloom_prefilter
from ..operators.graph import pagerank_int
from .registry import query


@query(
    "j_bloom_prefilter",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    )
    GROUP BY o_orderpriority
    """,
)
def j_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join (operators/bloom.py): build the
    dim-key Bloom filter distributively (shuffle bounded by filter
    size, not key count), broadcast the one-row bit array over the
    fact scan, drop non-candidates inside the scan stage, THEN run the
    exact semi-join on the surviving ~0.1% of rows.

    At 100 TB this is the explicit form of Spark's runtime bloom
    filter (spark.sql.optimizer.runtime.bloomFilter.enabled): the
    exact join's shuffle moves |matches| + fp*|facts| rows instead of
    |facts|.  False positives are removed by the exact join, so the
    result equals the plain semi-join — which is what the oracle runs.
    """
    dim = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    keys = dim.select("c_custkey")
    facts = table(spark, sf_dir, "orders")
    candidates = bloom_prefilter(
        facts, "o_custkey", keys, "c_custkey", n_bits=1 << 18, k=5
    )
    exact = candidates.join(
        keys.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "semi"
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("total_price"),
    )


_PR_SCALE = 10**12
_PR_EDGES_SQL = """
      SELECT DISTINCT o_custkey AS s, 1000000 + l_suppkey AS d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_orderkey % 50 = 0
"""


def _pr_round(prev: str, out: str) -> str:
    """One integer-PageRank round as SQL (mirrors operators/graph.py
    pagerank_int arithmetic exactly: BIGINT floor division via //)."""
    return f"""
    {out} AS (
      SELECT n.id,
             tele.t + (85 * COALESCE(i.s_in, 0)) // 100 AS rank
      FROM nodes n
      CROSS JOIN tele
      LEFT JOIN (
        SELECT e.d AS id, SUM(c.contrib) AS s_in
        FROM edges e
        JOIN (SELECT r.id, r.rank // dg.deg AS contrib
              FROM {prev} r JOIN deg dg ON r.id = dg.s) c
          ON e.s = c.id
        GROUP BY e.d
      ) i ON n.id = i.id
    )"""


@query(
    "graph_pagerank",
    oracle=f"""
    WITH raw AS ({_PR_EDGES_SQL}),
    edges AS (
      SELECT s, d FROM raw UNION SELECT d AS s, s AS d FROM raw
    ),
    deg AS (SELECT s, COUNT(*) AS deg FROM edges GROUP BY s),
    nodes AS (SELECT DISTINCT s AS id FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    tele AS (
      SELECT ((15 * {_PR_SCALE}::BIGINT) // 100) // n AS t,
             {_PR_SCALE}::BIGINT // n AS r0
      FROM nn
    ),
    r0 AS (SELECT id, tele.r0 AS rank FROM nodes CROSS JOIN tele),
    {_pr_round("r0", "r1")},
    {_pr_round("r1", "r2")},
    {_pr_round("r2", "r3")}
    SELECT id, CAST(rank AS BIGINT) AS rank
    FROM r3 ORDER BY rank DESC, id LIMIT 20
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 influence scores on the customer<->supplier trade graph
    (operators/graph.py pagerank_int, 3 synchronous rounds).  Every
    operation is non-negative BIGINT — rank mass 1e12 micro-units —
    so the scores are bit-identical regardless of partitioning, task
    order, or engine: the only way an iterative rank is value-checkable
    at all.  The oracle unrolls the same three rounds as CTEs.

    Scale shape: per round one node-id-partitioned join + one partial
    agg (same as connected components); the edge sample keeps the gate
    fast while the operator itself is size-agnostic.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 50 == 0
    ).select("l_orderkey", "l_suppkey")
    raw = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    sym = raw.unionByName(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    ranks = pagerank_int(sym, iters=3, scale=_PR_SCALE)
    return ranks.orderBy(F.desc("rank"), "id").limit(20)


@query(
    "events_max_concurrent",
    oracle="""
    WITH deltas AS (
      SELECT o_orderpriority, o_orderdate AS ts, COUNT(*) AS delta
      FROM orders GROUP BY o_orderpriority, o_orderdate
      UNION ALL
      SELECT o_orderpriority, o_orderdate + INTERVAL 90 DAY AS ts,
             -COUNT(*) AS delta
      FROM orders GROUP BY o_orderpriority, o_orderdate
    ),
    net AS (
      SELECT o_orderpriority, ts, SUM(delta) AS net
      FROM deltas GROUP BY o_orderpriority, ts
    ),
    cum AS (
      SELECT o_orderpriority,
             SUM(net) OVER (PARTITION BY o_orderpriority ORDER BY ts)
               AS open_orders
      FROM net
    )
    SELECT o_orderpriority, CAST(MAX(open_orders) AS BIGINT) AS max_concurrent
    FROM cum GROUP BY o_orderpriority
    """,
)
def events_max_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent open orders per priority class — the interval
    sweep: each interval becomes a +1 at its start and a -1 at its
    (exclusive) end, collapse deltas per timestamp, and the running
    sum's maximum is the answer.  O(n log n) with one shuffle, versus
    the quadratic interval self-join a naive formulation shuffles at
    100 TB.  Collapsing per-timestamp BEFORE the window makes the
    cumulative sum's ordering key unique, so the running values are
    deterministic (no peer-order sensitivity).
    """
    o = table(spark, sf_dir, "orders")
    starts = o.groupBy(
        "o_orderpriority", F.col("o_orderdate").alias("ts")
    ).agg(F.count("*").alias("delta"))
    ends = o.groupBy(
        "o_orderpriority",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("ts"),
    ).agg((-F.count("*")).alias("delta"))
    net = (
        starts.unionByName(ends)
        .groupBy("o_orderpriority", "ts")
        .agg(F.sum("delta").alias("net"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("ts")
    cum = net.select(
        "o_orderpriority", F.sum("net").over(w).alias("open_orders")
    )
    return cum.groupBy("o_orderpriority").agg(
        F.max("open_orders").alias("max_concurrent")
    )


@query(
    "events_seasonal_anomaly",
    oracle="""
    WITH base AS (
      SELECT event_type,
             dayofweek(ts) + 1 AS dow,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(12,2))) AS s1,
             SUM(CAST(CAST(value AS DECIMAL(12,2))
                      * CAST(value AS DECIMAL(12,2)) AS DECIMAL(24,4)))
               AS s2
      FROM events GROUP BY event_type, dayofweek(ts) + 1
    ),
    cut AS (
      SELECT event_type, dow,
             CAST(s1 AS DOUBLE) / n
             + 3 * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * n))
               AS threshold
      FROM base WHERE n > 1
    )
    SELECT e.event_type, c.dow, e.event_id,
           CAST(e.value AS DOUBLE) AS value, c.threshold
    FROM events e
    JOIN cut c
      ON e.event_type = c.event_type AND dayofweek(e.ts) + 1 = c.dow
    WHERE CAST(e.value AS DOUBLE) > c.threshold
    """,
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly screen: per (event_type, day-of-week)
    mean + 3 sigma threshold, then flag rows above their own season's
    threshold.  The filter-by-aggregate shape (tiny per-group moment
    agg broadcast back over the scan — never a window sort of the
    fact), with the moments accumulated in exact DECIMAL so mean and
    variance are independent of partitioning/sum order; the final
    double arithmetic runs on exact operands, bit-identical in both
    engines.
    """
    e = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.dayofweek("ts").alias("dow"),
        F.col("value").cast("double").alias("value"),
    )
    v2 = F.col("value").cast("decimal(12,2)")
    base = e.groupBy("event_type", "dow").agg(
        F.count("*").alias("n"),
        F.sum(v2).alias("s1"),
        F.sum((v2 * v2).cast("decimal(24,4)")).alias("s2"),
    )
    cut = base.filter(F.col("n") > 1).select(
        "event_type",
        "dow",
        (
            F.col("s1").cast("double") / F.col("n")
            + 3
            * F.sqrt(
                (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                    "double"
                )
                / (F.col("n") * F.col("n"))
            )
        ).alias("threshold"),
    )
    return (
        e.join(broadcast(cut), ["event_type", "dow"])
        .filter(F.col("value") > F.col("threshold"))
        .select("event_type", "dow", "event_id", "value", "threshold")
    )
