"""asof_join: backward/forward, strict/non-strict, outer-null, plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T10:00:00"), "L10"),
            (2, "k1", _ts("2024-01-01T12:00:00"), "L12"),
            (3, "k2", _ts("2024-01-01T11:00:00"), "L11"),
            (4, "k3", _ts("2024-01-01T09:00:00"), "L09"),
        ],
        "lid long, k string, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [
            (100, "k1", _ts("2024-01-01T09:30:00"), 9.5),
            (101, "k1", _ts("2024-01-01T10:00:00"), 10.0),
            (102, "k1", _ts("2024-01-01T11:30:00"), 11.5),
            (103, "k2", _ts("2024-01-01T11:30:00"), 11.5),
        ],
        "rid long, k string, ts timestamp, rval double",
    )
    return left, right


def _rows(df):
    return {r["lid"]: r for r in df.collect()}


def test_backward_non_strict_takes_equal_ts(frames):
    left, right = frames
    out = _rows(
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  right_cols=["rid", "rval", "ts"])
    )
    # equal timestamp row (rid=101) is eligible non-strict
    assert out[1]["rid_right"] == 101
    # latest at-or-before 12:00 is 11:30
    assert out[2]["rid_right"] == 102
    # k2 left at 11:00: right k2 row is later → no match
    assert out[3]["rid_right"] is None
    # k3 has no right rows at all → null columns, row preserved
    assert out[4]["rid_right"] is None and out[4]["rval_right"] is None


def test_backward_strict_excludes_equal_ts(frames):
    left, right = frames
    out = _rows(
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  right_cols=["rid", "rval", "ts"], strict=True)
    )
    assert out[1]["rid_right"] == 100  # 10:00 row excluded, 09:30 wins
    assert out[2]["rid_right"] == 102


def test_forward_directions(frames):
    left, right = frames
    fwd = _rows(
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  right_cols=["rid", "rval", "ts"], direction="forward")
    )
    assert fwd[1]["rid_right"] == 101  # equal ts eligible
    assert fwd[2]["rid_right"] is None  # nothing after 12:00
    assert fwd[3]["rid_right"] == 103
    strict_fwd = _rows(
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  right_cols=["rid", "rval", "ts"], direction="forward",
                  strict=True)
    )
    assert strict_fwd[1]["rid_right"] == 102  # first strictly after 10:00


def test_left_row_count_preserved(frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
    assert out.count() == left.count()
    assert set(left.columns).issubset(set(out.columns))


def test_plan_has_no_join(frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union+window, never a join node
    assert "Window" in plan


def test_invalid_direction(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  direction="sideways")
