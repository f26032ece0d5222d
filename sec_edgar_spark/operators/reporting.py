"""Persist-and-derive dedup reporting (VERDICT r8 #5).

At 100 TB the connected-components pipeline (LSH pairs → label
propagation) is the COST of a dedup run; every downstream report —
cluster-size histogram, keep-best selection, mass-balance audit —
must reuse its output, never recompute it.  The production shape is:

    comp = canonical_assignment(pairs, ...)            # pay once
    write_bucketed(comp, "components", path,
                   bucket_cols="component", n_buckets=N)
    ...
    hist = cluster_size_histogram(bucketed(spark, "components"), docs)
    keep = keep_best_selection(bucketed(spark, "components"), scored)

Both derivations below are pure functions of a components frame
(`doc_id`, `component`), so they accept either the freshly-computed
frame (the oracle-gated queries do this — one-shot semantics, hashes
unchanged) or a persisted bucketed scan.  When the components table is
bucketed on ``component``, the component-keyed aggregate inside
``cluster_size_histogram`` and the per-component window inside
``keep_best_selection`` run with ZERO Exchange — the bucketed scan
already satisfies their required hash distribution
(tests/test_bucketing.py::test_components_persist_and_derive asserts
both plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cluster_size_histogram(components: DataFrame, documents: DataFrame) -> DataFrame:
    """Cluster-size distribution (`cluster_size`, `n_clusters`,
    `n_docs`) from a components frame, with unclustered documents
    entering as size-1 clusters so doc mass always sums to the corpus.

    Scale shape: one component-keyed aggregate (shuffle-free over a
    component-bucketed scan), one size-keyed aggregate over the
    cluster-count-sized frame, two 1-row counts for the singleton row.
    """
    comp = components.select("doc_id", "component")
    sizes = comp.groupBy("component").agg(F.count("*").alias("sz"))
    hist = sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters")
    )
    n_clustered = comp.agg(F.count("*").alias("n_clustered"))
    n_docs = documents.agg(F.count("*").alias("n_docs"))
    singles = n_docs.crossJoin(F.broadcast(n_clustered)).select(
        F.lit(1).cast("bigint").alias("cluster_size"),
        (F.col("n_docs") - F.col("n_clustered")).alias("n_clusters"),
    )
    return (
        hist.unionByName(singles)
        .groupBy("cluster_size")
        .agg(
            F.sum("n_clusters").cast("bigint").alias("n_clusters"),
            F.sum(F.col("n_clusters") * F.col("cluster_size"))
            .cast("bigint")
            .alias("n_docs"),
        )
    )


def keep_best_selection(
    components: DataFrame,
    scored: DataFrame,
    score_col: str = "n_tokens",
) -> DataFrame:
    """Quality-aware canonical selection from a components frame plus a
    scored-documents frame (`doc_id`, score_col): keep the highest-
    scoring member of each cluster (ties → lowest doc_id); singletons
    are their own component and always kept.

    Scale shape: one left join (doc-keyed) and one per-component window
    — partition count equals cluster count, and over a component-
    bucketed components input the window's sort needs no Exchange.
    """
    comp = components.select("doc_id", "component")
    joined = scored.join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("component"),
        score_col,
    )
    w = Window.partitionBy("component").orderBy(F.desc(score_col), "doc_id")
    return joined.withColumn("rn", F.row_number().over(w)).select(
        "doc_id", "component", score_col, (F.col("rn") == 1).alias("keep")
    )
