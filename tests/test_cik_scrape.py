"""CIK HTML-scrape fallback — golden tests on the reference's own
fixtures (reference tests/test_cik_lookup.py expectations)."""

import os

import pytest

from sec_edgar_spark.exceptions import EDGARQueryError
from sec_edgar_spark.sources.cik_scrape import (
    parse_cik_search_html,
    resolve_ciks_with_scrape,
    scrape_cik,
    scrape_ciks,
)

FIXTURES = "/root/reference/secedgar/tests/data/CIK"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures unavailable"
)


def fixture(name: str) -> str:
    # EDGAR pages are served latin-1-ish; the reference lets requests
    # sniff the charset.  Decode permissively.
    with open(
        os.path.join(FIXTURES, name), encoding="utf-8", errors="replace"
    ) as fh:
        return fh.read()


def test_single_cik_search_result():
    cik, possibilities = parse_cik_search_html(
        fixture("single_cik_search_result.html")
    )
    # ref test: CIKLookup('aapl').lookup_dict == {'aapl': '320193'} via
    # span.companyName anchor first token.
    assert cik == "0000320193"
    assert possibilities == []


def test_multiple_results_returns_possibilities_no_cik():
    cik, possibilities = parse_cik_search_html(
        fixture("cik_multiple_results.html")
    )
    # ref: multiple matches -> warn and skip; candidates listed from the
    # Results table's second column.
    assert cik is None
    assert len(possibilities) > 1
    assert "Paper Battery Company, Inc." in possibilities


def test_not_found_raises():
    with pytest.raises(EDGARQueryError):
        parse_cik_search_html(fixture("cik_not_found.html"))


def test_scrape_cik_falls_back_to_company_param():
    """CIK probe rejected -> company probe used (cik_lookup.py:107-128)."""
    seen = []

    def fetch_html(params):
        seen.append(dict(params))
        if "CIK" in params:
            raise EDGARQueryError("No matching CIK.")
        return fixture("single_cik_search_result.html")

    cik, _ = scrape_cik("Apple Inc.", fetch_html)
    assert cik == "0000320193"
    assert seen == [{"CIK": "Apple Inc."}, {"company": "Apple Inc."}]


def test_scrape_ciks_stage(spark):
    # Capture fixture TEXT (not the module-level loader) so the closure
    # ships to executors without importing this test module.
    single = fixture("single_cik_search_result.html")
    multiple = fixture("cik_multiple_results.html")

    def fetch_html(params):
        from sec_edgar_spark.exceptions import EDGARQueryError

        term = params.get("CIK") or params.get("company")
        if term == "aapl":
            return single
        if term == "paper":
            return multiple
        raise EDGARQueryError("No matching companies.")

    lookups = spark.createDataFrame(
        [("aapl",), ("paper",), ("zzz",)], ["lookup_term"]
    )
    got = {r.lookup_term: r for r in scrape_ciks(lookups, fetch_html).collect()}
    assert got["aapl"].scraped_cik == 320193
    assert got["paper"].scraped_cik is None
    assert len(got["paper"].possibilities) > 1
    assert got["zzz"].scraped_cik is None and got["zzz"].possibilities is None


def test_resolve_with_scrape_end_to_end(spark):
    """Map hit stays map-resolved; miss goes through the scrape."""
    from sec_edgar_spark.sources.cik_map import read_cik_map

    cik_map = read_cik_map(spark, "tests/data/company_tickers.json")
    single = fixture("single_cik_search_result.html")

    def fetch_html(params):
        return single

    lookups = spark.createDataFrame(
        [("AAPL",), ("unknown co",)], ["lookup_term"]
    )
    got = {
        r.lookup_term: r
        for r in resolve_ciks_with_scrape(lookups, cik_map, fetch_html).collect()
    }
    assert got["AAPL"].resolved_by == "ticker"
    assert got["unknown co"].cik == 320193
    assert got["unknown co"].resolved_by == "scrape"


def test_filings_facade_with_scrape(spark):
    """filings(cik_lookup=..., fetch_html=...) routes unresolved terms
    through the scrape stage (reference cik_lookup.py:107-174 chain)."""
    from sec_edgar_spark.plans.filings import filings
    from sec_edgar_spark.sources.cik_map import read_cik_map
    from sec_edgar_spark.sources.index import read_master_idx

    index = read_master_idx(spark, "tests/data/full-index/1996/QTR4/master.idx")
    cik_map = read_cik_map(spark, "tests/data/company_tickers.json")
    single = fixture("single_cik_search_result.html")  # resolves to 320193

    def fetch_html(params):
        return single

    lookups = spark.createDataFrame([("not in map",)], ["lookup_term"])
    got = filings(index, cik_lookup=lookups, cik_map=cik_map, fetch_html=fetch_html)
    assert {r.cik for r in got.collect()} <= {320193}
