"""Closed-form in-plan ridge: the Cramer solve must equal numpy's
solution of the same normal equations, and prediction must be the
broadcast polynomial."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators.ridge import ridge3_fit, ridge3_predict


@pytest.fixture()
def data(spark):
    rows = [(i, i % 7, (i * 3) % 5, 10 + 2 * (i % 7) + 3 * ((i * 3) % 5))
            for i in range(200)]
    return spark.createDataFrame(
        rows, "id long, x1 long, x2 long, y long"
    )


def test_matches_numpy_solution(data):
    lam = 1
    w = ridge3_fit(
        data, F.col("x1"), F.col("x2"), F.col("y"), lam=lam
    ).collect()[0]
    pdf = data.toPandas()
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["x1"].values, pdf["x2"].values]
    ).astype(float)
    yv = pdf["y"].values.astype(float)
    want = np.linalg.solve(
        X.T @ X + lam * np.eye(3), X.T @ yv
    )
    got = np.array([w.w0, w.w1, w.w2])
    assert np.allclose(got, want, rtol=1e-10), (got, want)
    assert w.det != 0


def test_predictions_are_polynomial(data):
    w = ridge3_fit(data, F.col("x1"), F.col("x2"), F.col("y"))
    out = ridge3_predict(
        data, w.drop("det"), F.col("x1"), F.col("x2")
    ).collect()
    wv = w.collect()[0]
    for r in out[:10]:
        assert r.y_hat == wv.w0 + wv.w1 * float(r.x1) + wv.w2 * float(r.x2)


def test_near_perfect_fit_on_linear_data(data):
    """y was generated as 10 + 2*x1 + 3*x2 exactly; with tiny ridge the
    fit recovers the coefficients."""
    w = ridge3_fit(
        data, F.col("x1"), F.col("x2"), F.col("y"), lam=1
    ).collect()[0]
    assert abs(w.w1 - 2) < 0.05 and abs(w.w2 - 3) < 0.05
    assert abs(w.w0 - 10) < 0.5


def test_streaming_accumulation_equals_batch_fit(spark, tmp_path):
    """Model from waves of stats rows == one-shot fit on the union;
    replays (marker lost) change nothing — the append-only stats log
    has no torn-write window."""
    import os

    from sec_edgar_spark.streaming.ridge_stream import (
        ridge_accumulate_batch,
        read_model,
    )

    rows = [(i, i % 7, (i * 3) % 5, 10 + 2 * (i % 7) + 3 * ((i * 3) % 5))
            for i in range(300)]
    full = spark.createDataFrame(rows, "id long, x1 long, x2 long, y long")
    root = str(tmp_path / "model")
    for bid in range(3):
        ridge_accumulate_batch(
            spark, root, full.filter(F.col("id") % 3 == bid), bid
        )
    got = read_model(spark, root, lam=1).collect()[0]
    want = ridge3_fit(
        full, F.col("x1"), F.col("x2"), F.col("y"), lam=1
    ).collect()[0]
    assert (got.w0, got.w1, got.w2) == (want.w0, want.w1, want.w2)
    # replay with lost marker: identical stats row appended, deduped on
    # read — model unchanged
    os.remove(os.path.join(root, "_last_batch_id"))
    ridge_accumulate_batch(
        spark, root, full.filter(F.col("id") % 3 == 2), 2
    )
    again = read_model(spark, root, lam=1).collect()[0]
    assert (again.w0, again.w1, again.w2) == (want.w0, want.w1, want.w2)


def test_streaming_sink_end_to_end(spark, tmp_path):
    from sec_edgar_spark.streaming.ridge_stream import (
        read_model,
        run_ridge_maintenance,
    )

    rows = [(i, i % 4, i % 3, 5 + i % 4 + 2 * (i % 3)) for i in range(120)]
    full = spark.createDataFrame(rows, "id long, x1 long, x2 long, y long")
    feed = tmp_path / "feed"
    full.filter(F.col("id") < 60).write.parquet(str(feed / "w1"))
    stream = (
        spark.readStream.schema("id long, x1 long, x2 long, y long")
        .option("maxFilesPerTrigger", "1000")
        .parquet(str(feed) + "/*")
    )
    root = str(tmp_path / "model")
    q = run_ridge_maintenance(
        stream, root, checkpoint=str(tmp_path / "ckpt"), query_name="t_ridge"
    )
    try:
        q.processAllAvailable()
        full.filter(F.col("id") >= 60).write.parquet(str(feed / "w2"))
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    got = read_model(spark, root).collect()[0]
    want = ridge3_fit(full, F.col("x1"), F.col("x2"), F.col("y")).collect()[0]
    assert (got.w0, got.w1, got.w2) == (want.w0, want.w1, want.w2)
