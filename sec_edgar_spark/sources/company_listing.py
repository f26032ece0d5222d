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
