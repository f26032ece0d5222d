"""S3 listings-directory existence check — golden test on the
reference's own fixture (reference _index.py:100-143)."""

import datetime
import os

import pytest

from sec_edgar_spark.exceptions import EDGARQueryError
from sec_edgar_spark.sources.index import (
    available_daily_idx_paths,
    check_idx_available,
    listing_idx_filenames,
)

FIXTURE = "/root/reference/secedgar/tests/data/filings/daily/daily_index_2018_QTR4.htm"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(FIXTURE), reason="reference fixture unavailable"
)


@pytest.fixture(scope="module")
def listing():
    with open(FIXTURE, encoding="utf-8", errors="replace") as fh:
        return fh.read()


def test_fixture_filenames_parsed(listing):
    names = listing_idx_filenames(listing)
    assert "master.20181001.idx" in names
    assert "master.20181102.idx" in names or len(names) > 10


def test_present_day_passes(listing):
    check_idx_available(listing, "master.20181001.idx")


def test_missing_day_raises(listing):
    # 2018-10-06 was a Saturday: no idx file in the directory.
    with pytest.raises(EDGARQueryError, match="not found"):
        check_idx_available(listing, "master.20181006.idx")


def test_available_daily_idx_paths_skips_weekend(listing):
    dates = [
        datetime.date(2018, 10, 5),  # Friday — present
        datetime.date(2018, 10, 6),  # Saturday — absent
        datetime.date(2018, 10, 8),  # Monday (Columbus Day, but EDGAR filed)
    ]
    present, missing = available_daily_idx_paths(
        "mirror", dates, {(2018, 4): listing}
    )
    assert any(p.endswith("master.20181005.idx") for p in present)
    assert datetime.date(2018, 10, 6) in missing
    # A quarter with no listing page -> everything missing, nothing raises.
    present2, missing2 = available_daily_idx_paths(
        "mirror", [datetime.date(2019, 1, 2)], {(2018, 4): listing}
    )
    assert present2 == [] and len(missing2) == 1
