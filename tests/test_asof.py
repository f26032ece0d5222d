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


# ---- salted two-level form (bucket_s): bit-equal, hot-key-safe ----


BUCKET = 3600


def _both(left, right, **kw):
    """(classic, salted) result sets for equality assertions."""
    classic = sorted(map(tuple, asof_join(left, right, **kw).collect()))
    salted = sorted(
        map(tuple, asof_join(left, right, bucket_s=BUCKET, **kw).collect())
    )
    return classic, salted


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_salted_equals_classic_on_fixture(frames, direction, strict):
    left, right = frames
    classic, salted = _both(
        left, right, on="k", left_ts="ts", right_ts="ts",
        direction=direction, strict=strict,
    )
    assert classic == salted and classic


def test_salted_carry_across_many_empty_buckets(spark):
    """A left row 10 buckets after the only right row must inherit it
    through the carry chain (every intervening bucket is empty)."""
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T22:00:05"))], "lid long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, "k", _ts("2024-01-01T10:00:00"), 1.0)],
        "rid long, k string, ts timestamp, rval double",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", bucket_s=BUCKET
    ).collect()
    assert out[0]["rid_right"] == 100


def test_salted_bucket_edge_equal_ts(spark):
    """Equal timestamps exactly ON a bucket edge share the upper bucket,
    so strict/non-strict tie rules stay in-bucket — both must match the
    classic form."""
    edge = dt.datetime.utcfromtimestamp(1_700_000_000 - (1_700_000_000 % BUCKET))
    left = spark.createDataFrame(
        [(1, "k", edge), (2, "k", edge + dt.timedelta(seconds=1))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "k", edge - dt.timedelta(seconds=1), 1.0),  # prev bucket
            (101, "k", edge, 2.0),                            # on the edge
        ],
        "rid long, k string, ts timestamp, rval double",
    )
    for strict in (False, True):
        classic, salted = _both(
            left, right, on="k", left_ts="ts", right_ts="ts", strict=strict
        )
        assert classic == salted
    # non-strict: edge row matches itself; strict: only the prev-bucket row
    non_strict = {r["lid"]: r for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", bucket_s=BUCKET
    ).collect()}
    assert non_strict[1]["rid_right"] == 101
    strict_out = {r["lid"]: r for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", bucket_s=BUCKET,
        strict=True,
    ).collect()}
    assert strict_out[1]["rid_right"] == 100


def test_salted_plan_event_window_is_bucket_partitioned(frames):
    """Plan contract: the row-level window partitions by (key, _bkt);
    the only key-alone window is the carry over bucket summaries
    (ordered by _bkt)."""
    left, right = frames
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", bucket_s=BUCKET
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    key_windows = [
        ln for ln in plan.splitlines() if "windowspecdefinition(k#" in ln
    ]
    assert key_windows, plan
    for ln in key_windows:
        assert "_bkt" in ln, ln


def test_salted_bucket_s_validated(frames):
    left, right = frames
    with pytest.raises(ValueError, match="bucket_s"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts", bucket_s=0)
