"""range_join: recall across bin edges, boundary inclusion, no duplicates."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators.interval import range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T10:00:00")),
            (2, "k1", _ts("2024-01-01T12:00:00")),
            (3, "k2", _ts("2024-01-01T10:00:00")),
        ],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            # exactly at tolerance below 10:00 (boundary: included)
            (100, "k1", _ts("2024-01-01T09:30:00")),
            # 1s beyond tolerance (excluded)
            (101, "k1", _ts("2024-01-01T09:29:59")),
            # same instant
            (102, "k1", _ts("2024-01-01T10:00:00")),
            # crosses a bin edge upward from 10:00
            (103, "k1", _ts("2024-01-01T10:29:00")),
            # other key — never matches k1 rows
            (104, "k2", _ts("2024-01-01T10:01:00")),
        ],
        "rid long, k string, ts timestamp",
    )
    return left, right


def test_matches_and_boundaries(frames):
    left, right = frames
    out = range_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     tolerance_s=1800)
    got = {(r["lid"], r["rid_right"]) for r in out.collect()}
    assert got == {(1, 100), (1, 102), (1, 103), (3, 104)}


def test_no_duplicate_pairs(frames):
    left, right = frames
    out = range_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     tolerance_s=1800)
    assert out.count() == out.select("lid", "rid_right").distinct().count()


def test_plan_is_equi_join(frames):
    left, right = frames
    out = range_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     tolerance_s=1800)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_theta_equivalence(spark, frames):
    left, right = frames
    out = range_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     tolerance_s=1800).select("lid", "rid_right")
    theta = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (
                F.abs(F.col("l.ts").cast("long") - F.col("r.ts").cast("long"))
                <= 1800
            ),
        )
        .select(F.col("l.lid").alias("lid"), F.col("r.rid").alias("rid_right"))
    )
    assert out.exceptAll(theta).count() == 0
    assert theta.exceptAll(out).count() == 0
