"""Parity gate for the vectorized NumPy argmin kernel (r14).

operators/kmeans gained spark.sec_edgar.vectorized_argmin: the
assignment argmin runs as one ArrowEvalPython pandas_udf instead of
the interpreted Catalyst higher-order expression.  The contract is
BIT-IDENTICAL results (exact int64 both ways, ties to the lowest cell
id), so the flag can be flipped per deployment without touching any
query's output — asserted here on shapes that exercise the tie-break
and the grouped twin.
"""

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators import kmeans as K

CONF = "spark.sec_edgar.vectorized_argmin"


@pytest.fixture()
def _flag_off_after(spark):
    yield
    spark.conf.set(CONF, "false")


def _vecs(spark, n=40, d=6):
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(d)),
        lambda i: ((F.col("id") * 31 + i * 17) % 100).cast("double") / 50.0,
    )
    return spark.range(n).select("id", vec.alias("embedding"))


def _collect_sorted(df):
    return sorted(map(tuple, df.collect()))


def test_assign_cells_parity_and_ties(spark, _flag_off_after):
    df = _vecs(spark)
    q = K.quantize_vectors(df, "id", "embedding")
    cents = K.lloyd_fit(q, k=3, n_iter=1)
    # duplicate a centroid under a HIGHER cell id: every row nearest to
    # it is now equidistant to two cells and must pick the lower id in
    # BOTH paths
    dup = cents.filter(F.col("cell") == 0).select(
        (F.col("cell") + 100).alias("cell"), "cv"
    )
    cents_ties = cents.unionByName(dup)
    spark.conf.set(CONF, "false")
    expr = _collect_sorted(K.assign_cells(q, cents_ties))
    spark.conf.set(CONF, "true")
    vec = _collect_sorted(K.assign_cells(q, cents_ties))
    assert expr == vec
    assert not any(cell >= 100 for _, cell in vec), (
        "tie must resolve to the LOWER cell id in the kernel path"
    )


def test_lloyd_fit_parity(spark, _flag_off_after):
    df = _vecs(spark)
    q = K.quantize_vectors(df, "id", "embedding")
    spark.conf.set(CONF, "false")
    expr = _collect_sorted(
        K.lloyd_fit(q, k=4, n_iter=2).select(
            "cell", F.col("cv").cast("string")
        )
    )
    spark.conf.set(CONF, "true")
    vec = _collect_sorted(
        K.lloyd_fit(q, k=4, n_iter=2).select(
            "cell", F.col("cv").cast("string")
        )
    )
    assert expr == vec


def test_grouped_parity(spark, _flag_off_after):
    df = _vecs(spark, n=60, d=8)
    q = K.quantize_vectors(df, "id", "embedding")
    qg = q.select(
        (F.col("id") % 2).alias("g"),
        "id",
        F.slice("qv", 1, 4).alias("qv"),
    )
    spark.conf.set(CONF, "false")
    cents = K.lloyd_fit_grouped(qg, k=3, n_iter=2)
    expr_cents = _collect_sorted(
        cents.select("g", "cell", F.col("cv").cast("string"))
    )
    expr_assign = _collect_sorted(K.assign_cells_grouped(qg, cents))
    spark.conf.set(CONF, "true")
    cents_v = K.lloyd_fit_grouped(qg, k=3, n_iter=2)
    vec_cents = _collect_sorted(
        cents_v.select("g", "cell", F.col("cv").cast("string"))
    )
    vec_assign = _collect_sorted(K.assign_cells_grouped(qg, cents_v))
    assert expr_cents == vec_cents
    assert expr_assign == vec_assign
