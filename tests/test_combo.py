"""Combo date-split planner — expectations from reference
tests/core/test_combo.py:21-118."""

from datetime import date

import pytest

from sec_edgar_spark.plans.combo import (
    combo_date_split,
    combo_idx_paths,
    fill_days,
)


@pytest.mark.parametrize(
    "include_start,include_end,expected",
    [
        (True, True, ["2020-01-01", "2020-01-02", "2020-01-03"]),
        (True, False, ["2020-01-01", "2020-01-02"]),
        (False, True, ["2020-01-02", "2020-01-03"]),
        (False, False, ["2020-01-02"]),
    ],
)
def test_fill_days(include_start, include_end, expected):
    got = fill_days(date(2020, 1, 1), date(2020, 1, 3), include_start, include_end)
    assert [str(d) for d in got] == expected


def test_quarterly_only_one_year():
    quarterly, daily = combo_date_split(date(2020, 1, 1), date(2020, 12, 31))
    assert [(y, q) for y, q, _ in quarterly] == [
        (2020, 1), (2020, 2), (2020, 3), (2020, 4)
    ]
    assert all(clip == (None, None) for _, _, clip in quarterly)
    assert daily == []


def test_quarterly_only_multiple_years():
    quarterly, daily = combo_date_split(date(2018, 10, 1), date(2020, 6, 30))
    assert [(y, q) for y, q, _ in quarterly] == [
        (2018, 4), (2019, 1), (2019, 2), (2019, 3),
        (2019, 4), (2020, 1), (2020, 2),
    ]
    assert daily == []


def test_daily_only():
    quarterly, daily = combo_date_split(date(2020, 12, 10), date(2020, 12, 10))
    assert quarterly == []
    assert [str(d) for d in daily] == ["2020-12-10"]

    quarterly, daily = combo_date_split(date(2020, 12, 10), date(2020, 12, 12))
    assert quarterly == []
    assert [str(d) for d in daily] == ["2020-12-10", "2020-12-11", "2020-12-12"]


@pytest.mark.parametrize(
    "start,end,quarterly_expected,daily_expected",
    [
        (date(2019, 12, 28), date(2020, 4, 1), [(2020, 1)],
         ["2019-12-28", "2019-12-29", "2019-12-30", "2019-12-31", "2020-04-01"]),
        (date(2020, 3, 30), date(2020, 10, 2), [(2020, 2), (2020, 3)],
         ["2020-03-30", "2020-03-31", "2020-10-01", "2020-10-02"]),
        (date(2020, 1, 1), date(2020, 4, 2), [(2020, 1)],
         ["2020-04-01", "2020-04-02"]),
        (date(2020, 3, 30), date(2020, 9, 30), [(2020, 2), (2020, 3)],
         ["2020-03-30", "2020-03-31"]),
    ],
)
def test_daily_quarterly_mixed(start, end, quarterly_expected, daily_expected):
    quarterly, daily = combo_date_split(start, end)
    assert [(y, q) for y, q, _ in quarterly] == quarterly_expected
    assert [str(d) for d in daily] == daily_expected


def test_partial_quarter_above_balance_point_is_clipped_quarterly():
    # Start mid-quarter with >30 days to quarter end -> whole quarter
    # fetched, clipped at start (reference's start_date lambda).
    quarterly, daily = combo_date_split(date(2020, 1, 15), date(2020, 6, 30))
    assert [(y, q) for y, q, _ in quarterly] == [(2020, 1), (2020, 2)]
    assert quarterly[0][2] == (date(2020, 1, 15), None)
    assert quarterly[1][2] == (None, None)
    assert daily == []


def test_combo_idx_paths_era_and_order():
    paths = combo_idx_paths("mirror", date(2019, 12, 28), date(2020, 4, 1))
    assert paths[0] == "mirror/full-index/2020/QTR1/master.idx"
    assert "mirror/daily-index/2019/QTR4/master.20191228.idx" in paths
    assert paths[-1] == "mirror/daily-index/2020/QTR2/master.20200401.idx"
