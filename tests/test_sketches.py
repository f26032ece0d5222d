"""count-min sketch: over-estimate guarantee, bounded size, merge = build."""

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators.sketches import countmin_build, countmin_estimate


@pytest.fixture(scope="module")
def items(spark):
    # zipf-ish: 'a' x 50, 'b' x 20, then 30 singletons
    rows = [("a",)] * 50 + [("b",)] * 20 + [(f"t{i}",) for i in range(30)]
    return spark.createDataFrame(rows, "tok string")


def test_estimate_never_underestimates(spark, items):
    sketch = countmin_build(items, "tok", depth=4, width=64)
    truth = items.groupBy("tok").agg(F.count("*").alias("n"))
    est = countmin_estimate(sketch, truth, "tok", depth=4, width=64)
    bad = est.filter(F.col("cms_estimate") < F.col("n")).count()
    assert bad == 0


def test_sketch_size_bounded(items):
    sketch = countmin_build(items, "tok", depth=4, width=64)
    assert sketch.count() <= 4 * 64
    assert sketch.agg(F.max("row")).collect()[0][0] <= 3
    assert sketch.agg(F.max("bucket")).collect()[0][0] < 64


def test_partition_merge_equals_global_build(spark, items):
    # the groupBy formulation is mergeable: building on a union of two
    # halves equals summing two independently-built sketches.
    a = items.limit(40)
    b = items.exceptAll(a)
    merged = (
        countmin_build(a, "tok", depth=2, width=32)
        .unionByName(countmin_build(b, "tok", depth=2, width=32))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = countmin_build(items, "tok", depth=2, width=32)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_exact_when_no_collision(spark):
    # tiny distinct corpus, wide sketch: estimates are exact
    items = spark.createDataFrame([("x",)] * 7 + [("y",)] * 3, "tok string")
    sketch = countmin_build(items, "tok", depth=4, width=4096)
    truth = items.groupBy("tok").agg(F.count("*").alias("n"))
    est = countmin_estimate(sketch, truth, "tok", depth=4, width=4096)
    assert est.filter(F.col("cms_estimate") != F.col("n")).count() == 0


def test_stratified_sample(spark):
    from sec_edgar_spark.operators.sampling import hash_bucket, stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr") for i in range(200)], "id long, lang string"
    )
    out = stratified_sample(df, "id", "lang", {"en": 50, "fr": 10})
    rows = out.withColumn("b", hash_bucket("id")).collect()
    for r in rows:
        assert r["b"] < (50 if r["lang"] == "en" else 10)
    # unknown strata fall back to default_pct=0 → dropped entirely
    df2 = spark.createDataFrame([(1, "xx")], "id long, lang string")
    assert stratified_sample(df2, "id", "lang", {"en": 50}).count() == 0
