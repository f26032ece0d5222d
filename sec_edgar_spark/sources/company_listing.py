"""browse-edgar company-filings XML → listing table (SURVEY §2.1 S4,
§2.2 F5, §2.8 C9).

The reference paginates ``cgi-bin/browse-edgar?action=getcompany&
output=xml`` and walks ``<filinghref>`` soup elements
(core/company.py:269-303), re-checks ``<type>`` equality client-side
because the server prefix-matches (company.py:253-266), and derives the
raw ``.txt`` URL from the index-page href (company.py:295).

Spark-first: each fetched page is one XML string row; ``from_xml`` with
the companyFilings schema turns the whole corpus of pages into a typed
listing table in one explode — pagination becomes ``unionByName`` of
page frames upstream.
"""

from __future__ import annotations

import re
import warnings
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from ..functions.scalars import txt_url

COMPANY_FILINGS_XML = StructType(
    [
        StructField(
            "companyInfo",
            StructType(
                [
                    StructField("CIK", StringType()),
                    StructField("name", StringType()),
                ]
            ),
        ),
        StructField(
            "results",
            StructType(
                [
                    StructField(
                        "filing",
                        ArrayType(
                            StructType(
                                [
                                    StructField("dateFiled", StringType()),
                                    StructField("filingHREF", StringType()),
                                    StructField("formName", StringType()),
                                    StructField("type", StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)


def parse_company_listing(
    pages: DataFrame, xml_col: str = "xml", form_type: str | None = None
) -> DataFrame:
    """(…, xml) page rows → COMPANY_FILING_LISTING rows.

    ``form_type`` applies the F5 exact-type re-check; malformed hrefs
    (anything not an ``…-index.htm`` page, e.g. the reference fixture's
    deliberate BAD_LINK rows) are dropped before txt-URL derivation.
    """
    doc = F.from_xml(F.col(xml_col), COMPANY_FILINGS_XML)
    rows = pages.select(
        doc.getField("companyInfo").getField("CIK").alias("cik"),
        F.explode(doc.getField("results").getField("filing")).alias("f"),
    ).select(
        "cik",
        F.to_date("f.dateFiled").alias("datefiled"),
        F.col("f.filingHREF").alias("filinghref"),
        F.col("f.formName").alias("formname"),
        F.col("f.type").alias("type"),
    )
    if form_type is not None:
        rows = rows.filter(F.col("type") == form_type)
    valid = rows.filter(F.col("filinghref").rlike(r"-index\.htm[l]?$"))
    return valid.withColumn("txt_url", txt_url(F.col("filinghref")))


# --------------------------------------------------------------------------
# L2 — live pagination (reference company.py:269-303)
# --------------------------------------------------------------------------

_FILINGHREF_RE = re.compile(r"<filinghref>", re.I)
_TYPE_RE = re.compile(r"<type>([^<]*)</type>", re.I)


def browse_edgar_params(
    cik: str,
    start: int = 0,
    filing_type: str | None = None,
    count: int | None = None,
    ownership: str = "include",
    start_date: str | None = None,
    end_date: str | None = None,
) -> dict:
    """browse-edgar query params (reference company.py:110-145).

    Same keys the reference sends: action/output/start/CIK, plus
    type/count when set, datea/dateb when dates given, ownership
    always.  ``ownership`` validates like the reference setter
    (company.py:231-240).
    """
    if ownership not in ("include", "exclude"):
        raise ValueError(
            f"Ownership must be 'include' or 'exclude'. Given {ownership}."
        )
    params = {
        "action": "getcompany",
        "output": "xml",
        "start": start,
        "CIK": cik,
        "ownership": ownership,
    }
    if filing_type is not None:
        params["type"] = filing_type
    if count is not None:
        params["count"] = count
    if start_date is not None:
        params["datea"] = start_date
    if end_date is not None:
        params["dateb"] = end_date
    return params


def fetch_company_pages(
    fetch_page: Callable[[dict], str],
    cik: str,
    filing_type: str | None = None,
    count: int | None = None,
    batch_size: int = 10,
    **param_kwargs,
) -> list[str]:
    """Driver-side pagination loop (reference company.py:284-293).

    Steps ``start`` by ``batch_size`` until either enough type-matched
    filings have been seen (``count``) or a page carries no
    ``<filinghref>`` at all (end of listings).  Warns like the
    reference (company.py:297-300) when fewer than ``count`` found.

    The loop is inherently sequential HTTP (each page decides whether
    to fetch the next) and EDGAR caps the whole cluster at 10 req/s —
    so this stage runs on the driver by design; the returned pages
    then parse in parallel as a DataFrame.
    """
    pages: list[str] = []
    links = 0
    start = 0
    while count is None or links < count:
        page = fetch_page(
            browse_edgar_params(
                cik,
                start=start,
                filing_type=filing_type,
                count=batch_size,
                **param_kwargs,
            )
        )
        hrefs = _FILINGHREF_RE.findall(page)
        if filing_type is None:
            links += len(hrefs)
        else:
            # The reference filters client-side on exact <type> equality
            # (company.py:253-258) before counting toward ``count``.
            links += sum(1 for t in _TYPE_RE.findall(page) if t == filing_type)
        pages.append(page)
        start += batch_size
        if not hrefs:  # no more filings (company.py:292-293)
            break
    if isinstance(count, int) and links < count:
        warnings.warn(
            f"Only {links} of {count} filings were found for {cik}."
        )
    return pages


def company_filing_urls(
    spark,
    fetch_page: Callable[[dict], str],
    ciks: list[str],
    filing_type: str | None = None,
    count: int | None = None,
    batch_size: int = 10,
    **param_kwargs,
) -> DataFrame:
    """L2 end-to-end: paginate each CIK live, parse all pages as one
    DataFrame, keep at most ``count`` filings per CIK in page order
    (reference company.py:295-303 ``txt_urls[:count]``).

    The per-CIK truncation is a row_number window over (page_idx, pos)
    — Spark plans it as WindowGroupLimit (rank pushdown), no full sort
    of the corpus.
    """
    from pyspark.sql import Window

    rows = []
    for cik in ciks:
        for i, page in enumerate(
            fetch_company_pages(
                fetch_page,
                cik,
                filing_type=filing_type,
                count=count,
                batch_size=batch_size,
                **param_kwargs,
            )
        ):
            rows.append((cik, i, page))
    pages = spark.createDataFrame(rows, "lookup_cik string, page_idx int, xml string")
    return parse_paged_listing(pages, filing_type=filing_type, count=count)


def parse_paged_listing(
    pages: DataFrame,
    filing_type: str | None = None,
    count: int | None = None,
) -> DataFrame:
    """The DataFrame half of L2: (lookup_cik, page_idx, xml) page rows
    → typed listing rows, exact-type re-check, per-CIK ``count``
    truncation in page order (reference company.py:295-303
    ``txt_urls[:count]``), txt-URL derivation.

    The truncation is a row_number window over (page_idx, pos) — Spark
    plans it as WindowGroupLimit (rank pushdown), no full sort.
    """
    from pyspark.sql import Window

    doc = F.from_xml(F.col("xml"), COMPANY_FILINGS_XML)
    parsed = pages.select(
        "lookup_cik",
        "page_idx",
        doc.getField("companyInfo").getField("CIK").alias("cik"),
        F.posexplode(doc.getField("results").getField("filing")).alias("pos", "f"),
    ).select(
        "lookup_cik",
        "page_idx",
        "pos",
        "cik",
        F.to_date("f.dateFiled").alias("datefiled"),
        F.col("f.filingHREF").alias("filinghref"),
        F.col("f.type").alias("type"),
    )
    if filing_type is not None:
        parsed = parsed.filter(F.col("type") == filing_type)
    parsed = parsed.filter(F.col("filinghref").rlike(r"-index\.htm[l]?$"))
    if count is not None:
        w = Window.partitionBy("lookup_cik").orderBy("page_idx", "pos")
        parsed = (
            parsed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= count)
            .drop("_rn")
        )
    return parsed.drop("page_idx", "pos").withColumn(
        "txt_url", txt_url(F.col("filinghref"))
    )
