"""10x probe for the capped similarity joins ON A CORPUS WHERE THE
CAPS BIND (SCALE.md round-8).

The standard 10x replica (tools/scale_probe.py) suffixes every token
per replica, which DIVIDES df ratios by 10 — the df/posting caps
deliberately never bind there, so it cannot measure graceful
degradation.  This probe builds the opposite corpus: a VERBATIM 10x
replication (doc_id offset, text unchanged), the stopword-dense /
duplication-heavy regime the caps exist for:

- every token's df grows 10x while ndocs grows 10x, so the df-cap
  (75% of corpus) prunes the same token SET as at 1x;
- every surviving posting list grows 10x past _LEN_CAP (500), so the
  per-token truncation BINDS and bounds candidate volume at <= L^2
  per token — the uncapped twin's candidates grow ~100x (quadratic in
  the posting length).

Recall on this corpus is computable ANALYTICALLY, so the probe never
has to run the quadratic uncapped join at 10x to get the denominator:
with R verbatim replicas of n docs and P true 1x pairs (threshold
already satisfied), every original pair yields R*R cross/within-copy
pairs and every doc pairs with its own R-1 copies, so
    exact_pairs(10x) = R^2 * P + C(R,2) * n
(similarity of a copy-pair equals the original pair's similarity;
self-copies have similarity 1 >= any threshold).

Usage: python tools/binding_cap_probe.py [--with-uncapped-10x]
(the flag also times the uncapped twins at 10x — minutes, since their
candidate set is genuinely ~100x).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_verbatim10"
REPLICAS = 10

PAIRS = [
    # (capped query, uncapped twin)
    ("dedup_prefix_filter_capped", "dedup_prefix_filter_join"),
    ("dedup_containment_capped", "dedup_containment_pairs"),
]


def build_verbatim(spark) -> None:
    from sec_edgar_spark import catalog

    os.makedirs(OUT, exist_ok=True)
    doc = catalog.table(spark, BASE, "documents")
    # Replica stride derived from the data: a fixed 1e6 stride would
    # silently collide replicas on a base corpus with doc_id >= 1e6,
    # corrupting both the corpus and the analytical exact-pair
    # denominator (code review r8).
    stride = doc.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for k in range(REPLICAS):
        parts.append(
            doc.select(
                (F.col("doc_id") + k * stride).alias("doc_id"),
                *[c for c in doc.columns if c != "doc_id"],
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.coalesce(8).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")


def main() -> int:
    from sec_edgar_spark.session import get_spark
    import sec_edgar_spark.queries as Q

    with_uncapped = "--with-uncapped-10x" in sys.argv
    spark = get_spark(app_name="binding-cap-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{OUT}/documents.parquet"):
        print("building verbatim 10x documents replica...", flush=True)
        build_verbatim(spark)

    qs = Q.queries()

    def run(name, d):
        spark.catalog.clearCache()
        t0 = time.time()
        n = qs[name](spark, d).count()
        return time.time() - t0, n

    from sec_edgar_spark import catalog

    ndocs_1x = catalog.table(spark, BASE, "documents").count()
    print(
        f"{'query':32s} {'1x':>8s} {'10x':>8s} {'factor':>7s} "
        f"{'pairs@10x':>10s} {'recall':>7s}"
    )
    for capped, uncapped in PAIRS:
        t1, n1c = run(capped, BASE)
        t10, n10c = run(capped, OUT)
        # analytical exact-pair count at 10x from the 1x uncapped run
        _, p1 = run(uncapped, BASE)
        exact10 = REPLICAS * REPLICAS * p1 + (
            REPLICAS * (REPLICAS - 1) // 2
        ) * ndocs_1x
        print(
            f"{capped:32s} {t1:7.2f}s {t10:7.2f}s "
            f"{t10 / max(t1, 1e-9):6.1f}x {n10c:10d} "
            f"{n10c / max(exact10, 1):7.3f}",
            flush=True,
        )
        if with_uncapped:
            tu0 = time.time()
            nu = qs[uncapped](spark, OUT).count()
            print(
                f"  uncapped twin @10x: {time.time() - tu0:7.2f}s, "
                f"{nu} pairs (analytical {exact10})",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
