"""Adversarial-skew probe: one key owns 50% of the fact rows.

SCALE.md's j_salted_skew_join row shows flat 1x-vs-10x growth, but that
asserts the salting scales — not that it WINS.  This probe measures the
win directly (VERDICT r5 #8): a synthetic fact table where a single key
holds half of all rows, joined against a dim too big to broadcast,
under three strategies:

  A. plain shuffle join, AQE fully OFF — the structural baseline: the
     hot key's entire row mass lands on ONE reducer (the straggler is
     ~wall time on a 32-core box: 31 tasks finish instantly, one
     processes N/2 rows).
  B. plain shuffle join, AQE ON with skewJoin splitting (the session
     default) — what the engine already cures at runtime for
     sort-merge joins.
  C. operators/relational.salted_join, AQE ON — the structural cure
     that also covers what AQE cannot (repeated reuse of one build
     side, broadcast-hash plans, grouped aggregation upstream).

Besides wall time it reports the reducer-side row distribution
(max/mean partition rows) of the join stage — the deterministic
structural signature of the skew, independent of box noise: case A
shows max ≈ N/2, case C shows max ≈ N/(2·salt_buckets).

The groupBy analog (salted_aggregate) is probed too, with the honest
expectation that ALGEBRAIC aggs show ~no win: hash-aggregation's
map-side combine already collapses each mapper's hot-key rows to one
partial row, so the shuffle carries |keys|·P rows regardless of skew.
salted_aggregate exists for the cases where partials stay fat (exact
distinct counts, collect-style states) — measured here with
count_distinct, where phase-1 salting genuinely spreads the state.

Usage: python tools/skew_probe.py [n_rows]   (default 20_000_000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

HOT_KEY = 0
N_DIM = 200_000
SALTS = 32


def build(spark, n_rows: int):
    # 50% of rows on HOT_KEY, the rest uniform over N_DIM keys; payload
    # is the unique row id (the salt source).
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(HOT_KEY))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_DIM)))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("dim_val")
    )
    return fact, dim


def timed_noop(df) -> float:
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    return time.time() - t0


def partition_profile(df) -> tuple[int, float, int]:
    """(max_rows, mean_rows, n_partitions) of df's output partitions."""
    rows = (
        df.withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .count()
        .collect()
    )
    counts = [r["count"] for r in rows]
    return max(counts), sum(counts) / len(counts), len(counts)


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    from sec_edgar_spark.operators.relational import (
        salted_aggregate,
        salted_join,
    )
    from sec_edgar_spark.session import get_spark

    spark = get_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # dim must not broadcast or every case degenerates to a skew-immune
    # broadcast-hash join; 200k rows is borderline, so force it off.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fact, dim = build(spark, n_rows)
    fact.count()  # warm

    results: list[tuple[str, float, int, float]] = []

    def case(name: str, joined, profile_df=None):
        wall = timed_noop(joined)
        mx, mean, _ = partition_profile(
            joined if profile_df is None else profile_df
        )
        results.append((name, wall, mx, mean))
        print(f"{name}: wall={wall:.2f}s max_part={mx} mean_part={mean:.0f}")

    # A: AQE fully off — the structural baseline
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    case("A plain join, AQE off", fact.join(dim, "k"))

    # B: session default (AQE + skewJoin splitting)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    case("B plain join, AQE skew split", fact.join(dim, "k"))

    # C: structural salting (AQE on)
    case(
        "C salted_join(32)",
        salted_join(fact, dim, "k", salt_buckets=SALTS, salt_source="payload"),
    )

    # --- groupBy analog ---
    # algebraic: map-side combine already cures the skew (expect ~tie)
    t_plain = timed_noop(
        fact.groupBy("k").agg(F.sum("payload").alias("s"))
    )
    t_salted = timed_noop(
        salted_aggregate(fact, "k", {"s": ("payload", "sum")}, SALTS)
    )
    print(f"agg sum: plain={t_plain:.2f}s salted={t_salted:.2f}s")
    # holistic-ish: exact distinct — partials stay fat without salting
    t_plain_d = timed_noop(
        fact.groupBy("k").agg(F.countDistinct("payload").alias("d"))
    )
    salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64("payload"), F.lit(SALTS))
    )
    t_salted_d = timed_noop(
        salted.groupBy("k", "_salt")
        .agg(F.countDistinct("payload").alias("pd"))
        .groupBy("k")
        .agg(F.sum("pd").alias("d"))
    )
    print(
        f"agg count_distinct: plain={t_plain_d:.2f}s "
        f"salted2phase={t_salted_d:.2f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
