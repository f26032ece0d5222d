"""filings() planner facade tests (SURVEY §3.1 dispatch semantics)."""

import datetime

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.filing_types import FilingTypeError, validate_filing_type
from sec_edgar_spark.plans.filings import filings, grouped_urls
from sec_edgar_spark.sources.cik_map import read_cik_map
from sec_edgar_spark.sources.index import read_master_idx


@pytest.fixture(scope="module")
def index(spark, data_dir):
    return read_master_idx(
        spark,
        [
            f"{data_dir}/full-index/1996/QTR4/master.idx",
            f"{data_dir}/daily-index/2024/QTR1/master.20240115.idx",
        ],
    ).cache()


def test_form_type_and_date_filter(index, spark):
    got = filings(index, filing_type="10-K", start_date="1996-01-01", end_date="1996-12-31")
    rows = got.collect()
    assert {r.cik for r in rows} == {320193, 40545}
    assert all(r.url.startswith("https://www.sec.gov/Archives/") for r in rows)


def test_invalid_filing_type_raises(index):
    with pytest.raises(FilingTypeError):
        filings(index, filing_type="not a form!!")
    validate_filing_type("10-K")  # well-formed passes


def test_cik_lookup_semi_join(index, spark, data_dir):
    dim = read_cik_map(spark, f"{data_dir}/company_tickers.json")
    lookups = spark.createDataFrame([("AAPL",)], ["lookup_term"])
    got = filings(index, cik_lookup=lookups, cik_map=dim)
    assert {r.cik for r in got.collect()} == {320193}


def test_count_limits_newest_per_cik(index):
    got = filings(index, count=1)
    rows = {r.cik: r for r in got.collect()}
    # Apple: newest of 3 filings across both files is the 2024 daily one
    assert rows[320193].date_filed == datetime.date(2024, 1, 15)
    # every cik exactly once
    assert got.count() == got.select("cik").distinct().count()


def test_user_filter_column_and_callable(index):
    col_filtered = filings(index, user_filter=F.col("form_type") == "S-1")
    assert col_filtered.count() == 1
    py_filtered = filings(
        index, user_filter=lambda r: r["form_type"] == "S-1"
    )
    assert py_filtered.count() == 1


def test_ownership_and_match_format(index):
    excl = filings(index, ownership="exclude")
    assert all(r.form_type not in ("3", "4", "5") for r in excl.collect())
    amend = filings(index, match_format="AMEND")
    assert {r.form_type for r in amend.collect()} == {"SC 13D/A"}
    exact = filings(index, match_format="EXACT")
    assert all(not r.form_type.endswith("/A") for r in exact.collect())
    with pytest.raises(ValueError):
        filings(index, ownership="maybe")
    with pytest.raises(ValueError):
        filings(index, match_format="SOME")


def test_grouped_urls_sorted(index):
    g = {r.cik: r.urls for r in grouped_urls(filings(index)).collect()}
    apple = g[320193]
    assert len(apple) == 3
    # sorted by (date_filed, line_no): 1996-10-02, 1996-12-19, 2024-01-15
    assert apple[0].endswith("0000320193-96-000017.txt")
    assert apple[-1].endswith("0000320193-24-000004.txt")
