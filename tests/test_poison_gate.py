"""Standing CI gate over the hostile-input corpus (POISON.md).

One representative query per poison fix class runs against
``testdata_sf0.001_poison/`` (committed, deterministic) and must match
its DuckDB oracle under the driver-strict comparator — so a regression
in any robustness guard (decimal widths, JSON guards, the NULL-text
token contract, the embedding validity gate, NULL-ordering exclusions,
UTF-8 blob casts, the trend-test pair fixes) fails CI instead of
waiting for the next manual sweep.  The FULL 267-query poison sweep
stays a tools/check_oracle.py run; this test pins the classes.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.check_oracle import compare, duck_connect  # noqa: E402

POISON = os.path.join(
    os.path.dirname(__file__), "..", "testdata_sf0.001_poison"
)

# class -> representative query (see POISON.md tables)
CLASS_REPS = [
    ("ansi-decimal-overflow", "events_tumbling_daily"),
    ("calendar-widening-pairs", "events_trend_mannkendall"),
    ("theilsen-grouped-median", "events_trend_theilsen"),
    ("malformed-json", "events_json_props"),
    ("trailing-garbage-json", "events_json_variant"),
    ("null-text-token-contract", "text_quality_filter"),
    ("null-text-sgml", "edgar_sgml_roundtrip"),
    ("embedding-validity-gate", "ann_bruteforce_topk"),
    ("ungated-audit-measurable-median", "emb_norm_outliers"),
    ("cross-engine-null-ordering", "events_rank_sum_test"),
    ("zero-token-domains", "curation_mixture_reweight"),
    ("utf8-blob-cast", "multimodal_metadata"),
    ("salted-rows-frame", "window_moving_avg_salted"),
]


@pytest.mark.slow
@pytest.mark.parametrize(
    "cls,name", CLASS_REPS, ids=[c for c, _ in CLASS_REPS]
)
def test_poison_class_representative(spark, cls, name):
    import sec_edgar_spark.queries as Q

    sf_dir = os.path.abspath(POISON)
    assert os.path.exists(os.path.join(sf_dir, "documents.parquet"))
    qs, oracles = Q.queries(), Q.oracle_sql()
    spark.catalog.clearCache()
    spark_pdf = qs[name](spark, sf_dir).toPandas()
    con = duck_connect(sf_dir)
    duck_pdf = con.execute(oracles[name]).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"[{cls}] {name}: {problems}"
    assert len(spark_pdf) > 0
