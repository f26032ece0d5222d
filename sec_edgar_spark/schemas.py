"""Canonical schemas (SURVEY §1.2 mapping decisions).

The reference is stringly-typed (every idx field a str, dates in three
shapes — _index.py:155-168, utils.py:5-25); the engine normalizes to
typed columns at scan time and keeps nested data as native STRUCT/ARRAY/
MAP instead of JSON-in-string.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# The central relation: one row per filing-index entry
# (FilingEntry namedtuple, reference core/_index.py:155-158).
FILING_INDEX = StructType(
    [
        StructField("cik", LongType()),
        StructField("company_name", StringType()),
        StructField("form_type", StringType()),
        StructField("date_filed", DateType()),
        StructField("file_name", StringType()),
        StructField("path", StringType()),  # 'Archives/' || file_name (derived)
        StructField("accession_number", StringType()),  # derived (_base.py:72-79)
        StructField("line_no", LongType()),  # file position (order-sensitivity)
    ]
)

# Raw idx row as scanned (before normalization); quarterly dates are
# 'yyyy-MM-dd', daily are 'yyyyMMdd'.
FILING_INDEX_RAW = StructType(
    [
        StructField("cik", StringType()),
        StructField("company_name", StringType()),
        StructField("form_type", StringType()),
        StructField("date_filed", StringType()),
        StructField("file_name", StringType()),
    ]
)

# browse-edgar company listing rows (company.py:269-303; FIXTURES.md §2).
COMPANY_FILING_LISTING = StructType(
    [
        StructField("cik", StringType()),
        StructField("datefiled", DateType()),
        StructField("filinghref", StringType()),
        StructField("formname", StringType()),
        StructField("type", StringType()),
        StructField("txt_url", StringType()),
    ]
)

# Ticker/title → CIK dimension (cik_lookup.py:32-37; FIXTURES.md §3).
CIK_MAP = StructType(
    [
        StructField("ticker", StringType()),
        StructField("title", StringType()),
        StructField("cik_str", LongType()),
    ]
)

# One SGML filing container exploded into documents (parser.py:39-242;
# FIXTURES.md §4).
FILING_DOCUMENT = StructType(
    [
        StructField("accession_number", StringType()),
        StructField("metadata", MapType(StringType(), StringType())),
        StructField(
            "documents",
            ArrayType(
                StructType(
                    [
                        StructField("type", StringType()),
                        StructField("sequence", StringType()),
                        StructField("filename", StringType()),
                        StructField("text", StringType()),
                        StructField("is_uuencoded", BooleanType()),
                    ]
                )
            ),
        ),
    ]
)

# Flattened Form-4 non-derivative transactions (parser.py:288-336;
# FIXTURES.md §5).
FORM4_TRANSACTION = StructType(
    [
        StructField("accession_number", StringType()),
        StructField("security_title", StringType()),
        StructField("transaction_date", DateType()),
        StructField("transaction_form_type", StringType()),
        StructField("transaction_code", StringType()),
        StructField("equity_swap_involved", BooleanType()),
        StructField("transaction_shares", DecimalType(18, 4)),
        StructField("transaction_price_per_share", DecimalType(18, 4)),
        StructField("acquired_disposed_code", StringType()),
        StructField("shares_owned_following", DecimalType(18, 4)),
        StructField("direct_or_indirect_ownership", StringType()),
    ]
)

# XBRL facts in long form (rest.py:126-205; FIXTURES.md §6).
XBRL_FACT = StructType(
    [
        StructField("cik", LongType()),
        StructField("entity_name", StringType()),
        StructField("taxonomy", StringType()),
        StructField("tag", StringType()),
        StructField("unit", StringType()),
        StructField("val", DecimalType(24, 4)),
        StructField("fy", IntegerType()),
        StructField("fp", StringType()),
        StructField("form", StringType()),
        StructField("filed", DateType()),
        StructField("accn", StringType()),
        StructField("frame", StringType()),
    ]
)
