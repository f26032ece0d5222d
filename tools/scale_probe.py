"""10x scale probe for the query battery (SCALE.md methodology).

Builds a 10x replica of the documents/events/embeddings tables under
/tmp with per-replica key offsets chosen to keep PER-KEY density
constant (new users, new docs, new vectors — not hotter ones), runs
selected queries at 1x and 10x with the noop sink, and prints the
wall-clock growth factor.

Replica transforms and what they keep honest:

- events: user_id/event_id offset per replica, timestamps unchanged —
  windows per user and join fan-outs stay constant; linear ops should
  probe ~1x-2x (overhead-bound) at this scale.
- documents: every token gets a per-replica suffix, so intra-document
  repetition (the repetition/chunk signals) is preserved but NO chunk
  or shingle collides across replicas — a replica is new data, not 10
  copies of the old corpus (10 verbatim copies would multiply the TRUE
  pair answer quadratically and probe the answer, not the operator).
- embeddings: per-replica deterministic shear (x_i + k*0.001*(i+1)) —
  new vectors, same dimension/scale.  NOTE dedup_embedding_cosine is
  exact all-pairs BY DESIGN: compute grows ~100x at 10x; the probe
  reports that honestly (what matters is the throughput of the Arrow
  scorer and that memory stays bounded by (n/B)^2).
- relational (lineitem/orders/customer/supplier/part): every key
  column gets the same per-replica offset, so each replica is a new
  disjoint slice of the SAME star schema — orders per customer,
  lineitems per order, parts per brand all keep their density, and
  the broadcast dims grow 10x too (which is exactly what happens at a
  bigger SF).  nation/region are fixed-cardinality dims and copy
  through unchanged.

Usage: python tools/scale_probe.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_scale10"
REPLICAS = 10

DEFAULT_PROBES = [
    "events_funnel_conversion",
    "events_retention_cohorts",
    "text_repetition_filter",
    "curation_domain_mix",
    "curation_chunk_windows",
    "dedup_chunk_overlap",
    "dedup_embedding_cosine",
]


def build_replicas(spark, base: str = None, out: str = None, replicas: int = None, stride_mult: int = 1) -> None:
    """``stride_mult`` scales every per-replica key offset — pass 10
    when ``base`` is itself a 10x replica (second-decade build) so the
    new offsets clear the base's full key range."""
    from sec_edgar_spark import catalog

    base = base or BASE
    out = out or OUT
    replicas = replicas or REPLICAS
    m = stride_mult

    os.makedirs(out, exist_ok=True)

    ev = catalog.table(spark, base, "events")
    parts = []
    for k in range(replicas):
        parts.append(
            ev.select(
                (F.col("event_id") + k * m * 10_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + k * m * 1_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.coalesce(8).write.mode("overwrite").parquet(f"{out}/events.parquet")

    doc = catalog.table(spark, base, "documents")
    parts = []
    for k in range(replicas):
        suffixed = F.array_join(
            F.transform(
                F.filter(F.split("text", r"\s+"), lambda t: t != ""),
                lambda t: F.concat(t, F.lit(f"_{k}")),
            ),
            " ",
        )
        parts.append(
            doc.select(
                (F.col("doc_id") + k * m * 1_000_000).alias("doc_id"),
                suffixed.alias("text"),
                "lang",
                "source",
                *[c for c in doc.columns if c not in ("doc_id", "text", "lang", "source")],
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.coalesce(8).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = catalog.table(spark, base, "embeddings")
    parts = []
    for k in range(replicas):
        sheared = F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x + F.lit(float(k)) * 0.001 * (i.cast("double") + 1.0),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + k * m * 1_000_000).alias("vec_id"),
                sheared.cast("array<float>").alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.coalesce(8).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


_KEY_OFFSETS = {
    # column -> per-replica stride (disjoint across 10 replicas at sf<=1)
    "l_orderkey": 100_000_000,
    "l_partkey": 10_000_000,
    "l_suppkey": 1_000_000,
    "o_orderkey": 100_000_000,
    "o_custkey": 10_000_000,
    "c_custkey": 10_000_000,
    "s_suppkey": 1_000_000,
    "p_partkey": 10_000_000,
}


def build_relational_replicas(spark, base: str = None, out: str = None, replicas: int = None, stride_mult: int = 1) -> None:
    from sec_edgar_spark import catalog

    base = base or BASE
    out = out or OUT
    replicas = replicas or REPLICAS
    m = stride_mult

    os.makedirs(out, exist_ok=True)
    for t in ("lineitem", "orders", "customer", "supplier", "part"):
        df = catalog.table(spark, base, t)
        parts = []
        for k in range(replicas):
            cols = [
                (F.col(c) + k * m * _KEY_OFFSETS[c]).alias(c)
                if c in _KEY_OFFSETS
                else F.col(c)
                for c in df.columns
            ]
            parts.append(df.select(*cols))
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.coalesce(8).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in ("nation", "region"):
        catalog.table(spark, base, t).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")


def main() -> int:
    from sec_edgar_spark.session import get_spark
    import sec_edgar_spark.queries as Q

    probes = sys.argv[1:] or DEFAULT_PROBES
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{OUT}/embeddings.parquet"):
        print("building 10x replicas...", flush=True)
        build_replicas(spark)
    if not os.path.exists(f"{OUT}/lineitem.parquet"):
        print("building 10x relational replicas...", flush=True)
        build_relational_replicas(spark)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    noop(spark.range(10000).mapInPandas(lambda it: it, "id long"))
    qs = Q.queries()
    print(f"{'query':35s} {'1x':>7s} {'10x':>7s} {'factor':>7s}")
    for name in probes:
        fn = qs[name]
        times = {}
        for label, d in (("1x", BASE), ("10x", OUT)):
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                noop(fn(spark, d))
                best = min(best, time.time() - t0)
            times[label] = best
        print(
            f"{name:35s} {times['1x']:6.2f}s {times['10x']:6.2f}s "
            f"{times['10x'] / max(times['1x'], 1e-9):6.1f}x",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
