"""S6 — CIK HTML-scrape fallback (reference cik_lookup.py:107-174).

When the ticker/title map (``resolve_ciks``) leaves a lookup term
unresolved, the reference falls back to scraping browse-edgar's HTML
search: first a ``CIK=<term>`` query, then a ``company=<term>`` query
(cik_lookup.py:107-128), then

- single match  → the CIK is the first whitespace token of the anchor
  text inside ``<span class="companyName">`` (cik_lookup.py:144-146);
- multiple matches → the reference warns and SKIPS the term, listing
  the candidate company names from the second column of the
  ``<table summary="Results">`` (cik_lookup.py:147-175);
- no match → browse-edgar answers with an in-band error body
  ("No matching ..."), which response validation turns into
  ``EDGARQueryError`` → the term stays unresolved.

The HTML parse uses the stdlib event parser, NOT regex: EDGAR's pages
are minified with unquoted attributes and unclosed ``<tr>``/``<td>``
tags (see the reference's own fixtures, tests/data/CIK/*.html), which
``html.parser`` handles and naive regex does not.

Spark shape: the scrape runs inside ``mapPartitions`` over ONLY the
NULL-cik remainder of the broadcast-join resolution — at scale that
remainder is tiny (the map resolves the overwhelming majority), so the
slow HTTP path touches few rows, and the transport is injectable for
hermetic tests.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from html.parser import HTMLParser

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..exceptions import EDGARQueryError


class _CikSearchParser(HTMLParser):
    """Event parser for browse-edgar company-search result pages.

    Collects exactly what the reference reads with BeautifulSoup:
    the anchor text inside ``span.companyName`` (single match) and the
    per-row cell texts of ``table[summary=Results]`` (multi match).
    """

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._in_company_span = False
        self._in_company_anchor = False
        self.company_anchor_text: str | None = None
        self._in_results_table = False
        self._cell: int | None = None
        self.rows: list[list[str]] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "span" and a.get("class") == "companyName":
            self._in_company_span = True
        elif tag == "a" and self._in_company_span and self.company_anchor_text is None:
            self._in_company_anchor = True
            self.company_anchor_text = ""
        elif tag == "table" and a.get("summary") == "Results":
            self._in_results_table = True
        elif tag == "tr" and self._in_results_table:
            self.rows.append([])
            self._cell = None
        elif tag == "td" and self._in_results_table and self.rows:
            self.rows[-1].append("")
            self._cell = len(self.rows[-1]) - 1

    def handle_endtag(self, tag):
        if tag == "span":
            self._in_company_span = False
        elif tag == "a" and self._in_company_anchor:
            self._in_company_anchor = False
        elif tag == "table":
            self._in_results_table = False
            self._cell = None

    def handle_data(self, data):
        if self._in_company_anchor:
            self.company_anchor_text += data
        elif self._in_results_table and self.rows and self._cell is not None:
            # All descendant strings of the cell concatenate, matching
            # the reference's ''.join(td.find_all(string=True)).
            self.rows[-1][self._cell] += data


def parse_cik_search_html(html: str) -> tuple[str | None, list[str]]:
    """Parse one browse-edgar search page.

    Returns ``(cik, [])`` for a single-company page, ``(None,
    possibilities)`` for a multi-match page (reference warns + skips),
    and raises ``EDGARQueryError`` when neither is present
    (cik_lookup.py:168-175).
    """
    p = _CikSearchParser()
    p.feed(html)
    if p.company_anchor_text:
        # First whitespace token of the anchor text is the zero-padded
        # CIK (cik_lookup.py:144-146).
        return p.company_anchor_text.split()[0], []
    if p.rows:
        # Skip the header row; company names are the second column
        # (cik_lookup.py:160-167).
        possibilities = [r[1] for r in p.rows[1:] if len(r) >= 2]
        if possibilities:
            return None, possibilities
    raise EDGARQueryError("No results were found for the CIK lookup.")


def scrape_cik(
    lookup: str,
    fetch_html: Callable[[dict], str],
) -> tuple[str | None, list[str]]:
    """One term through the reference's two-step probe
    (cik_lookup.py:107-128): ``CIK=<term>`` first, fall back to
    ``company=<term>`` when EDGAR rejects it.

    ``fetch_html(params) -> str`` is the injected transport (the real
    one calls browse-edgar with response validation; tests serve the
    reference's own golden fixtures).  Raises ``EDGARQueryError`` when
    both probes fail.
    """
    try:
        html = fetch_html({"CIK": lookup})
    except EDGARQueryError:
        html = fetch_html({"company": lookup})
    return parse_cik_search_html(html)


SCRAPE_RESULT = StructType(
    [
        StructField("lookup_term", StringType()),
        StructField("scraped_cik", LongType()),
        StructField("possibilities", ArrayType(StringType())),
    ]
)


def scrape_ciks(
    lookups: DataFrame,
    fetch_html: Callable[[dict], str],
) -> DataFrame:
    """Scrape stage over a one-column ``lookup_term`` DataFrame.

    One row out per term: ``scraped_cik`` set on a single match; NULL
    with ``possibilities`` listing the candidates on a multi-match
    (the reference's warn-and-skip, cik_lookup.py:147-156); NULL with
    NULL possibilities when EDGAR has no results at all.
    """

    def run(rows: Iterator[Row]) -> Iterator[Row]:
        for row in rows:
            term = row.lookup_term
            try:
                cik, possibilities = scrape_cik(term, fetch_html)
            except EDGARQueryError:
                yield Row(lookup_term=term, scraped_cik=None, possibilities=None)
                continue
            yield Row(
                lookup_term=term,
                scraped_cik=int(cik) if cik is not None else None,
                possibilities=possibilities or None,
            )

    return (
        lookups.select("lookup_term").rdd.mapPartitions(run).toDF(SCRAPE_RESULT)
    )


def resolve_ciks_with_scrape(
    lookups: DataFrame,
    cik_map: DataFrame,
    fetch_html: Callable[[dict], str],
) -> DataFrame:
    """Full reference resolution chain: broadcast map join first
    (cik_lookup.py:35-37 dict probe), HTML scrape for the remainder
    (cik_lookup.py:107-174).

    Returns (lookup_term, cik, resolved_by) with ``resolved_by`` one of
    digits/ticker/title/scrape, or NULL cik when nothing resolved.
    """
    from .cik_map import resolve_ciks

    mapped = resolve_ciks(lookups, cik_map)
    unresolved = mapped.filter(F.col("cik").isNull()).select("lookup_term")
    scraped = scrape_ciks(unresolved, fetch_html)
    return (
        mapped.join(scraped, "lookup_term", "left")
        .select(
            "lookup_term",
            F.coalesce("cik", "scraped_cik").alias("cik"),
            F.when(F.col("cik").isNotNull(), F.col("resolved_by"))
            .when(F.col("scraped_cik").isNotNull(), F.lit("scrape"))
            .alias("resolved_by"),
        )
    )
