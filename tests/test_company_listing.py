"""browse-edgar XML listing parse (S4/F5/C9) — includes the reference's
deliberate bad-href case (company.py:253-266 filter semantics)."""

import datetime

from pyspark.sql import functions as F

from sec_edgar_spark.sources.company_listing import parse_company_listing


def _pages(spark, data_dir):
    with open(f"{data_dir}/company_filings_page.xml") as f:
        xml = f.read()
    return spark.createDataFrame([(xml,)], ["xml"])


def test_listing_parse_drops_bad_hrefs(spark, data_dir):
    rows = parse_company_listing(_pages(spark, data_dir)).collect()
    assert len(rows) == 3  # BAD_LINK row dropped
    assert all(r.cik == "0000320193" for r in rows)
    q = next(r for r in rows if r.type == "10-Q")
    assert q.datefiled == datetime.date(2020, 1, 28)
    assert q.txt_url.endswith("/0000320193-20-000010.txt")


def test_listing_exact_type_recheck(spark, data_dir):
    # server prefix-matches: requesting 10-Q must NOT return 10-Q/A
    rows = parse_company_listing(_pages(spark, data_dir), form_type="10-Q").collect()
    assert [r.type for r in rows] == ["10-Q"]


def test_listing_pagination_union(spark, data_dir):
    pages = _pages(spark, data_dir)
    both = pages.unionByName(pages)
    rows = parse_company_listing(both, form_type="10-K").collect()
    assert len(rows) == 2  # one per page
