"""observe_stage: metrics arrive from the single real pass (no second
scan), at multiple lineage points, on the real parquet."""

import os

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators.observability import observe_stage, quality_metrics

SF_DIR = "/root/testdata/sf0.001"


def test_metrics_from_single_pass(spark):
    df = spark.range(100).select(
        "id", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v")
    )
    staged, obs = observe_stage(df, "t_obs_a", *quality_metrics("v"))
    kept = staged.filter(F.col("v").isNotNull())
    assert kept.count() == 90
    got = obs.get
    assert got["n_rows"] == 100  # observed BEFORE the filter
    assert got["n_null_v"] == 10


def test_two_stage_funnel_metrics(spark):
    df = spark.range(1000).select("id", (F.col("id") % 4).alias("g"))
    s1, o1 = observe_stage(df, "t_obs_in", F.count(F.lit(1)).alias("n"))
    filtered = s1.filter(F.col("g") != 0)
    s2, o2 = observe_stage(filtered, "t_obs_out", F.count(F.lit(1)).alias("n"))
    s2.write.format("noop").mode("overwrite").save()
    assert o1.get["n"] == 1000
    assert o2.get["n"] == 750  # drop ratio derivable with zero extra scans


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_observe_on_real_documents(spark):
    from sec_edgar_spark.catalog import table

    d = table(spark, SF_DIR, "documents")
    staged, obs = observe_stage(
        d, "t_obs_docs", *quality_metrics("lang", "text")
    )
    n = staged.filter(F.length("text") > 0).count()
    got = obs.get
    assert got["n_rows"] >= n
    assert got["n_null_text"] == 0
