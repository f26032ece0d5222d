"""L2 live pagination (reference company.py:269-303; expectations from
reference tests/core/test_company.py:398-445)."""

import pytest

from sec_edgar_spark.sources.company_listing import (
    browse_edgar_params,
    company_filing_urls,
    fetch_company_pages,
)


def make_page(cik: str, n: int, start: int = 0, form: str = "10-Q") -> str:
    filings = "".join(
        f"""<filing>
          <dateFiled>2020-01-{(start + i) % 28 + 1:02d}</dateFiled>
          <filingHREF>https://www.sec.gov/Archives/edgar/data/{int(cik)}/{int(cik):010d}-20-{start + i:06d}-index.htm</filingHREF>
          <formName>Report</formName>
          <type>{form}</type>
        </filing>"""
        for i in range(n)
    )
    return (
        '<?xml version="1.0"?><companyFilings>'
        f"<companyInfo><CIK>{cik}</CIK><name>Test Co.</name></companyInfo>"
        f"<results>{filings}</results></companyFilings>"
    )


EMPTY_PAGE = (
    '<?xml version="1.0"?><companyFilings>'
    "<companyInfo><CIK>0000320193</CIK><name>Test Co.</name></companyInfo>"
    "<results></results></companyFilings>"
)


def endless_fetcher(cik="0000320193"):
    """Every page has 10 filings (ref mock_single_cik_filing)."""

    def fetch(params):
        return make_page(cik, 10, start=params["start"])

    return fetch


def limited_fetcher(num_filings, cik="0000320193"):
    """Pages run dry after num_filings (ref
    MockSingleCIKFilingLimitedResponses, test_company.py:49-60)."""

    def fetch(params):
        start = params["start"]
        if start < num_filings:
            return make_page(cik, min(10, num_filings - start), start=start)
        return EMPTY_PAGE

    return fetch


def test_params_match_reference():
    p = browse_edgar_params("0000320193", filing_type="10-Q", count=10)
    assert p["action"] == "getcompany"
    assert p["output"] == "xml"
    assert p["ownership"] == "include"
    assert p["CIK"] == "0000320193"
    assert p["type"] == "10-Q"
    with pytest.raises(ValueError):
        browse_edgar_params("320193", ownership="both")


def test_pagination_stops_on_empty_page():
    fetch = limited_fetcher(25)
    pages = fetch_company_pages(fetch, "0000320193", count=None)
    # 3 pages of filings + the empty page that terminates the loop.
    assert len(pages) == 4


def test_pagination_stops_at_count():
    calls = []

    def fetch(params):
        calls.append(params["start"])
        return make_page("0000320193", 10, start=params["start"])

    fetch_company_pages(fetch, "0000320193", count=25)
    # ceil(25/10) = 3 pages; start steps by batch_size.
    assert calls == [0, 10, 20]


def test_warns_when_fewer_than_count(recwarn):
    # ref test_filings_warning_lt_count: count=20 with only 10 available.
    with pytest.warns(UserWarning, match="Only"):
        fetch_company_pages(limited_fetcher(10), "0000320193", count=20)


@pytest.mark.parametrize("count", [10, 25, 30])
def test_filing_returns_correct_number_of_urls(spark, count):
    # ref test_filing_returns_correct_number_of_urls
    df = company_filing_urls(
        spark,
        endless_fetcher(),
        ["0000320193", "0000789019"],
        filing_type="10-Q",
        count=count,
    )
    per_cik = {
        r.lookup_cik: r.n for r in df.groupBy("lookup_cik").count().withColumnRenamed("count", "n").collect()
    }
    assert per_cik == {"0000320193": count, "0000789019": count}


def test_count_respects_type_filter(spark):
    """Pages mixing types: only exact-type matches count toward the cap
    (ref _filter_filing_links, company.py:253-258)."""

    def fetch(params):
        start = params["start"]
        if start >= 40:
            return EMPTY_PAGE
        # 5 of 10 filings per page are 10-K noise.
        tenq = make_page("0000320193", 5, start=start, form="10-Q")
        tenk = make_page("0000320193", 5, start=start + 5, form="10-K")
        merged = tenq.replace(
            "</results>",
            tenk.split("<results>")[1].split("</results>")[0] + "</results>",
        )
        return merged

    df = company_filing_urls(
        spark, fetch, ["0000320193"], filing_type="10-Q", count=12
    )
    rows = df.collect()
    assert len(rows) == 12
    assert all(r.type == "10-Q" for r in rows)


def test_txt_urls_derived(spark):
    df = company_filing_urls(spark, endless_fetcher(), ["0000320193"], count=3)
    for r in df.collect():
        assert r.txt_url.endswith(".txt")
        assert "-index" not in r.txt_url
