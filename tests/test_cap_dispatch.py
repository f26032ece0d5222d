"""Exact heat dispatch for the cap families (VERDICT r12 #2).

The salt dispatch (operators/heat.pick_bucket) may sample because both
plan families are bit-identical.  The CAP families are not: capped
plans drop rows whenever a cap binds, so the only safe dispatch is the
THEOREM "exact max group size <= cap ⟹ capped == uncapped".  These
tests pin:

- the exact probe itself (values + memoization),
- that a provably-non-binding cap is skipped (plan-level),
- that dispatched and forced-capped plans produce identical rows on
  corpora where the cap does not bind (the gate condition),
- that a binding cap still dispatches capped.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators import heat
from sec_edgar_spark.operators.dedup import prefix_filter_join

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ----------------------------------------------------------- exact probe


def test_exact_max_group_rows_value(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k int")
    assert heat.exact_max_group_rows(df, "k") == 3


def test_exact_max_group_rows_empty(spark):
    df = spark.createDataFrame([], "k int")
    assert heat.exact_max_group_rows(df, "k") == 0


def test_exact_probe_memoizes_like_statistics(spark):
    heat.clear_cache()
    try:
        df = spark.createDataFrame([(1,), (1,), (2,)], "k int")
        assert heat.exact_max_group_rows(df, "k", cache_key=("t", "k")) == 2
        # same key, different frame → cached value (stats semantics)
        df7 = spark.createDataFrame([(9,)] * 7, "k int")
        assert heat.exact_max_group_rows(df7, "k", cache_key=("t", "k")) == 2
        assert heat.exact_max_group_rows(df7, "k", cache_key=("t2", "k")) == 7
    finally:
        heat.clear_cache()


# -------------------------------------------------- posting-cap dispatch


def _mini_docs(spark):
    # 6 docs over a vocabulary where max df = 4 ("common"), others <= 2
    rows = [
        (1, "common alpha beta"),
        (2, "common alpha gamma"),
        (3, "common delta epsilon"),
        (4, "common zeta eta"),
        (5, "theta iota kappa"),
        (6, "lam mu nu"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_nonbinding_len_cap_is_skipped_and_identical(spark):
    d = _mini_docs(spark)
    uncapped = prefix_filter_join(d, "doc_id", "text", threshold=0.5)
    dispatched = prefix_filter_join(
        d, "doc_id", "text", threshold=0.5, posting_len_cap=10
    )  # max df 4 <= 10: provably non-binding
    assert "row_number" not in _plan(dispatched)
    assert _rows(dispatched) == _rows(uncapped)


def test_binding_len_cap_stays(spark):
    d = _mini_docs(spark)
    dispatched = prefix_filter_join(
        d, "doc_id", "text", threshold=0.5, posting_len_cap=2
    )  # max df 4 > 2: must keep the truncation window
    assert "row_number" in _plan(dispatched)


def test_nonbinding_df_cap_is_skipped_and_identical(spark):
    d = _mini_docs(spark)
    uncapped = prefix_filter_join(d, "doc_id", "text", threshold=0.5)
    # max df 4 of 6 docs = 66% <= 90%: provably non-binding
    dispatched = prefix_filter_join(
        d, "doc_id", "text", threshold=0.5, posting_df_cap_pct=90
    )
    assert "LeftAnti" not in _plan(dispatched)
    assert _rows(dispatched) == _rows(uncapped)


def test_binding_df_cap_stays_and_subsets(spark):
    d = _mini_docs(spark)
    uncapped = prefix_filter_join(d, "doc_id", "text", threshold=0.5)
    # max df 4 of 6 docs = 66% > 50%: cap must stay
    dispatched = prefix_filter_join(
        d, "doc_id", "text", threshold=0.5, posting_df_cap_pct=50
    )
    assert "LeftAnti" in _plan(dispatched)
    assert set(_rows(dispatched)) <= set(_rows(uncapped))


def test_token_df_stats_memoized_per_key(spark):
    from sec_edgar_spark.operators.dedup import token_df_stats

    heat.clear_cache()
    try:
        d = _mini_docs(spark)
        docs = (
            d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
            .distinct()
            .groupBy("doc_id")
            .agg(F.collect_list("tok").alias("toks_ord"))
        )
        st = token_df_stats(docs, 50, cache_key=("mini",))
        assert st[0] == 6 and st[1] == 4  # ndocs, max df ("common")
        assert st[2] <= 4  # max unblocked df
        # memo: different frame, same key → cached tuple
        empty = docs.filter(F.lit(False))
        assert token_df_stats(empty, 50, cache_key=("mini",)) == st
    finally:
        heat.clear_cache()


# ------------------------------------------------- query-level dispatch


def _force_hot(monkeypatch):
    """Force the capped branch by making the exact probe report a huge
    hottest group (the probe itself is exact; this simulates a hot
    corpus so both branches can be compared on the same data)."""
    monkeypatch.setattr(
        heat, "exact_max_group_rows", lambda *a, **k: 10**9
    )


@pytest.mark.skipif(
    not __import__("os").path.exists(SF), reason="driver testdata missing"
)
def test_er_capped_dispatch_equals_forced_capped(spark, monkeypatch):
    from sec_edgar_spark.queries import QUERIES

    heat.clear_cache()
    try:
        dispatched = _rows(QUERIES["er_match_score_capped"](spark, SF))
        _force_hot(monkeypatch)
        forced = _rows(QUERIES["er_match_score_capped"](spark, SF))
        # gate corpora: cap provably non-binding → identical rows
        assert dispatched == forced
        assert len(dispatched) > 0
    finally:
        heat.clear_cache()


@pytest.mark.skipif(
    not __import__("os").path.exists(SF), reason="driver testdata missing"
)
def test_semantic_capped_dispatch_equals_forced_capped(spark, monkeypatch):
    from sec_edgar_spark.queries import QUERIES

    heat.clear_cache()
    try:
        dispatched = QUERIES["dedup_semantic_capped"](spark, SF)
        assert "sub" in dispatched.columns
        d_rows = _rows(dispatched)
        _force_hot(monkeypatch)
        f_rows = _rows(QUERIES["dedup_semantic_capped"](spark, SF))
        assert d_rows == f_rows
    finally:
        heat.clear_cache()
        spark.catalog.clearCache()
