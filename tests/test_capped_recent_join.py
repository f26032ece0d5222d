"""capped_recent_join (operators/interval.py): the skew-proof bounded-
lookback association — semantics and the ≤k-per-left-row guarantee.

Born from the r10 skew probe: uncapped range_join attribution OOM-died
on a corpus where one user holds 30% of events (BENCH_SF1_SKEW.md)."""

import datetime

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators.interval import capped_recent_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-10 12:00:00")),
            (2, 10, _ts("2024-01-02 00:00:00")),
            (3, 20, _ts("2024-01-05 00:00:00")),
            (4, 30, _ts("2024-01-05 00:00:00")),  # key with no rights
        ],
        "lid long, key long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 00:00:00")),
            (101, 10, _ts("2024-01-04 00:00:00")),
            (102, 10, _ts("2024-01-09 00:00:00")),
            (103, 10, _ts("2024-01-10 12:00:00")),  # ties left #1 exactly
            (104, 10, _ts("2024-01-11 00:00:00")),  # after every left
            (105, 20, _ts("2024-01-04 23:59:59")),
        ],
        "rid long, key long, rts timestamp",
    )
    return left, right


def _pairs(df):
    return sorted((r.lid, r.rid) for r in df.collect())


def test_semantics_uncapped_window(spark, frames):
    """With k large, result = every (left, right) with rts <= lts and
    lts - rts <= tolerance — the range-join semantics."""
    left, right = frames
    out = capped_recent_join(
        left, right, on="key", left_ts="lts", right_ts="rts",
        right_id="rid", k=100, tolerance="7 DAYS",
    )
    assert _pairs(out) == [
        (1, 101),  # 6.5 days back
        (1, 102),
        (1, 103),  # non-strict: rts == lts qualifies
        (2, 100),
        (3, 105),
    ]


def test_cap_keeps_most_recent_k(spark, frames):
    left, right = frames
    out = capped_recent_join(
        left, right, on="key", left_ts="lts", right_ts="rts",
        right_id="rid", k=2, tolerance="7 DAYS",
    )
    # left 1: of (101,102,103) only the 2 most recent survive
    assert _pairs(out) == [(1, 102), (1, 103), (2, 100), (3, 105)]


def test_tolerance_refines_after_cap(spark, frames):
    left, right = frames
    out = capped_recent_join(
        left, right, on="key", left_ts="lts", right_ts="rts",
        right_id="rid", k=100, tolerance="2 DAYS",
    )
    assert _pairs(out) == [(1, 102), (1, 103), (2, 100), (3, 105)]


def test_hot_key_bounded_candidates(spark):
    """One key holds ALL right rows; candidates must still be <= k per
    left row (the whole point), and they are the k most recent."""
    n = 2000
    base = datetime.datetime(2024, 1, 1)
    right = spark.createDataFrame(
        [(i, 1, base + datetime.timedelta(minutes=i)) for i in range(n)],
        "rid long, key long, rts timestamp",
    )
    left = spark.createDataFrame(
        [(0, 1, base + datetime.timedelta(minutes=n))],
        "lid long, key long, lts timestamp",
    )
    out = capped_recent_join(
        left, right, on="key", left_ts="lts", right_ts="rts",
        right_id="rid", k=25, tolerance="365 DAYS",
    ).collect()
    assert len(out) == 25
    assert sorted(r.rid for r in out) == list(range(n - 25, n))


def test_k_below_one_rejected(spark, frames):
    """k=0 would make F.sequence(greatest(1, r+1), r) DESCENDING —
    silently emitting rank r+1, a right row possibly AFTER left_ts
    (ADVICE r10) — so the operator must refuse it eagerly."""
    left, right = frames
    for bad_k in (0, -3):
        with pytest.raises(ValueError, match="k must be >= 1"):
            capped_recent_join(
                left, right, on="key", left_ts="lts", right_ts="rts",
                right_id="rid", k=bad_k, tolerance="7 DAYS",
            )
