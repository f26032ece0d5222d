"""Persist-and-derive dedup reporting (VERDICT r8 #5, extended r10).

At 100 TB the connected-components pipeline (LSH pairs → label
propagation) is the COST of a dedup run; every downstream report —
cluster-size histogram, keep-best selection, residual audit,
modularity, per-source rates, the curation funnel — must reuse its
output, never recompute it.  The production shape is ONE pipeline
pass:

    pairs = <LSH candidate+verify>                     # pay once
    comp  = canonical_assignment(pairs, ...)           # pay once
    pairs.write.parquet(...); write_bucketed(comp, "components",
                   path, bucket_cols="component", n_buckets=N)
    ...every report below derives from those two tables (plus
    corpus-side doc frames) with zero candidate-generation recompute.

Every function here is a pure function of (pairs, components,
doc-keyed corpus frames), so it accepts either freshly-computed
frames (the oracle-gated queries do exactly this — one-shot
semantics, self-contained oracles, hashes unchanged: each gate query
is now a thin composition over these functions, so the derived and
composed paths CANNOT drift) or persisted scans.  When the components
table is bucketed on ``component``, the component-keyed aggregate
inside ``cluster_size_histogram`` and the per-component window inside
``keep_best_selection`` run with ZERO Exchange
(tests/test_bucketing.py::test_components_persist_and_derive);
tests/test_bucketing.py::test_report_suite_derives_from_one_pass
proves the WHOLE report suite (histogram, keep-best, residual audit,
modularity, rate-by-source, funnel) derives from one persisted pass
with no shingling/MinHash stage in any derived plan.
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
    The join carries an explicit MERGE hint: the components side is
    corpus-PROPORTIONAL (a heavy-dup corpus clusters most documents),
    so the auto-broadcast Catalyst picks from gate-scale stats is a
    driver hash-build that dies first under a tight heap (measured:
    BENCH_LOWMEM.md — this exact query was the 2 GB casualty) and is
    no plan at all at 100 TB.
    """
    comp = components.select("doc_id", "component")
    joined = scored.hint("merge").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("component"),
        score_col,
    )
    w = Window.partitionBy("component").orderBy(F.desc(score_col), "doc_id")
    return joined.withColumn("rn", F.row_number().over(w)).select(
        "doc_id", "component", score_col, (F.col("rn") == 1).alias("keep")
    )


def components_modularity(pairs: DataFrame, components: DataFrame) -> DataFrame:
    """Newman modularity of the components partition over the pair
    graph, in exact integer ppm (1-row report; see the
    graph_components_modularity query docstring for the algebra).

    ``pairs``: (doc_a, doc_b) verified near-dup edges;
    ``components``: (doc_id, component).

    Scale shape: two doc-keyed joins of the edge list against the
    components map (broadcastable — near-dup docs ≪ corpus), one
    degree aggregate, a component-keyed rollup, then 1 row.
    """
    pairs = pairs.select("doc_a", "doc_b")
    comp = components.select("doc_id", "component")
    m = pairs.agg(F.count("*").alias("m_edges"))
    ca = comp.select(
        F.col("doc_id").alias("doc_a"), F.col("component").alias("comp_a")
    )
    cb = comp.select(
        F.col("doc_id").alias("doc_b"), F.col("component").alias("comp_b")
    )
    e_in = (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(F.col("comp_a") == F.col("comp_b"))
        .groupBy(F.col("comp_a").alias("component"))
        .agg(F.count("*").alias("ec"))
    )
    degs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .join(comp, "doc_id")
        .groupBy("component")
        .agg(F.count("*").alias("dc"))
    )
    per = (
        degs.join(e_in, "component", "left")
        .select(
            "component",
            F.coalesce("ec", F.lit(0)).alias("ec"),
            "dc",
        )
        .crossJoin(F.broadcast(m))
        .select(
            "component",
            "ec",
            "dc",
            "m_edges",
            (
                4 * F.col("m_edges") * F.col("ec") - F.col("dc") * F.col("dc")
            ).alias("num_term"),
        )
    )
    return per.agg(
        F.count("*").cast("bigint").alias("n_communities"),
        F.max("m_edges").cast("bigint").alias("m_edges"),
        F.sum("ec").cast("bigint").alias("intra_edges"),
        F.expr(
            "CAST(SUM(num_term) * 1000000 DIV (4 * MAX(m_edges) * MAX(m_edges))"
            " AS BIGINT)"
        ).alias("modularity_ppm"),
    )


def residual_audit(pairs: DataFrame, kept: DataFrame) -> DataFrame:
    """Post-keep-best ship gate (1 row): verified near-dup pairs that
    SURVIVE among the kept documents — zero when clusters equal
    connected components.

    ``pairs``: (doc_a, doc_b); ``kept``: (doc_id) of the keepers.

    Scale shape: two joins of the sparse pair list against the kept
    set, three 1-row counts.  The kept side is corpus-PROPORTIONAL
    (keepers are most of the corpus), so the joins carry explicit
    MERGE hints — the gate-scale auto-broadcast of the kept set is a
    driver hash-build with no 100 TB analog (the BENCH_LOWMEM.md
    tight-heap casualty class).
    """
    pairs = pairs.select("doc_a", "doc_b")
    kept = kept.select("doc_id")
    residual = pairs.hint("merge").join(
        kept.select(F.col("doc_id").alias("doc_a")), "doc_a"
    ).hint("merge").join(kept.select(F.col("doc_id").alias("doc_b")), "doc_b")
    n_pairs = pairs.agg(F.count("*").alias("n_pairs"))
    n_res = residual.agg(F.count("*").alias("n_residual_pairs"))
    n_kept = kept.agg(F.count("*").alias("n_docs_kept"))
    return (
        n_pairs.crossJoin(F.broadcast(n_res))
        .crossJoin(F.broadcast(n_kept))
        .select(
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.col("n_residual_pairs").cast("bigint").alias("n_residual_pairs"),
            F.col("n_docs_kept").cast("bigint").alias("n_docs_kept"),
            F.when(F.col("n_pairs") == 0, F.lit(0).cast("bigint"))
            .otherwise(
                F.expr(
                    "CAST(n_residual_pairs * 1000000 DIV n_pairs AS BIGINT)"
                )
            )
            .alias("residual_ppm"),
        )
    )


def rate_by_source(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """Near-duplication rate per source: doc share and token-mass
    share of documents with ≥1 verified near-dup.

    ``pairs``: (doc_a, doc_b); ``docs``: (source, doc_id, n_toks).

    Scale shape: dup-doc ids are a union+distinct over the sparse pair
    list; membership probe is a doc-keyed (broadcastable) join; report
    is one source-keyed aggregate.
    """
    dup_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    flagged = docs.join(dup_docs, "doc_id", "left").select(
        "source", "n_toks", F.coalesce("is_dup", F.lit(0)).alias("is_dup")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("is_dup").cast("bigint").alias("n_dup_docs"),
            F.sum(F.col("is_dup") * F.col("n_toks")).alias("_dup_toks"),
            F.sum("n_toks").alias("_toks"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            F.expr("CAST(n_dup_docs * 1000000 DIV n_docs AS BIGINT)").alias(
                "dup_doc_ppm"
            ),
            # GREATEST guard: a source whose docs are all empty/NULL
            # text has zero token mass — its token-dup share is 0, not
            # a job-killing ANSI divide-by-zero (POISON.md)
            F.expr(
                "CAST(_dup_toks * 1000000 "
                "DIV GREATEST(_toks, CAST(1 AS BIGINT)) AS BIGINT)"
            ).alias("dup_token_ppm"),
        )
        .orderBy("source")
    )


def funnel_report(
    quality: DataFrame,
    canon: DataFrame,
    keep: DataFrame,
    documents: DataFrame,
) -> DataFrame:
    """Curation funnel: doc/token survivors after each stage
    (ingest → quality → exact dedup → near-dup keep-best) with
    retained-docs ppm vs ingest.

    ``quality``: (doc_id, n_tokens, passes_quality);
    ``canon``: (doc_id) exact-dedup canonicals chosen within quality
    survivors; ``keep``: (doc_id, keep) near-dup keep flags;
    ``documents``: corpus frame for the ingest denominator.

    Scale shape: each stage is a doc-keyed semi-join flag; the rollup
    is four 1-row aggregates unioned (constant output).  The canon and
    keep sides are corpus-PROPORTIONAL (survivors are most of the
    corpus), so the stage joins carry explicit MERGE hints — same
    rationale as residual_audit.
    """
    s0 = quality.select("doc_id", "n_tokens")
    s1 = quality.filter("passes_quality").select("doc_id", "n_tokens")
    s2 = s1.hint("merge").join(canon.select("doc_id"), "doc_id")
    s3 = s2.hint("merge").join(keep.filter("keep").select("doc_id"), "doc_id")

    def stage(df: DataFrame, ord_: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(ord_).cast("bigint").alias("stage_ord"),
            F.lit(name).alias("stage"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )

    stages = (
        stage(s0, 0, "ingest")
        .unionByName(stage(s1, 1, "quality"))
        .unionByName(stage(s2, 2, "exact_dedup"))
        .unionByName(stage(s3, 3, "near_dedup_keep_best"))
    )
    total = documents.agg(F.count("*").alias("n0"))
    return (
        stages.crossJoin(F.broadcast(total))
        .select(
            "stage_ord",
            "stage",
            "n_docs",
            "n_tokens",
            F.expr("CAST(n_docs * 1000000 DIV n0 AS BIGINT)").alias(
                "retained_docs_ppm"
            ),
        )
        .orderBy("stage_ord")
    )
