"""Parsing operators in the oracle gate, via construct→parse roundtrips.

The testdata has no raw SGML/XML blobs, so these queries *construct*
filing payloads deterministically from table columns, push them through
the REAL parsers (parsing/form4.from_xml plan, parsing/meta mapInPandas
stage), and emit the recovered typed fields.  The DuckDB oracle
reconstructs the same values directly from the base columns — any
parser deviation (field extraction, nesting, typing, text trimming)
breaks the value hash.  This puts C14-C17 on the correctness gate
instead of unit-tests-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import query


@query(
    "edgar_form4_roundtrip",
    oracle="""
    SELECT
      '0000320193-96-' || lpad((o_orderkey % 100000)::VARCHAR, 6, '0')
        AS accession_number,
      'Common Stock' AS security_title,
      CAST(o_orderdate AS DATE) AS transaction_date,
      '4' AS transaction_form_type,
      o_orderstatus AS transaction_code,
      (o_orderkey % 2 = 1) AS equity_swap_involved,
      CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
        AS transaction_shares,
      CAST(CAST(o_custkey AS DECIMAL(12,2)) AS DOUBLE)
        AS transaction_price_per_share,
      CASE WHEN o_orderkey % 3 = 0 THEN 'A' ELSE 'D' END
        AS acquired_disposed_code,
      CAST((o_orderkey % 1000) AS DOUBLE) AS shares_owned_following,
      'D' AS direct_or_indirect_ownership
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def edgar_form4_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16/C17 on the gate: build an ownershipDocument XML per row from
    orders columns, parse it with the production from_xml plan
    (parsing/form4.parse_form4), return the typed transaction table.

    Gate output casts the three decimal(18,4) amount columns to double:
    the driver's hash renders Spark decimals scale-padded
    ('144449.0400') but DuckDB decimals as pandas float64 ('144449.04'),
    so scale>2 decimal gate output can never hash-match (the
    CORRECTNESS_r04 failure class).  parse_form4 itself stays typed."""
    from ..parsing.form4 import parse_form4

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    accession = F.concat(
        F.lit("0000320193-96-"),
        F.lpad((F.col("o_orderkey") % 100000).cast("string"), 6, "0"),
    )
    xml = F.concat(
        F.lit(
            "<?xml version=\"1.0\"?><ownershipDocument><documentType>4"
            "</documentType><nonDerivativeTable><nonDerivativeTransaction>"
            "<securityTitle><value>Common Stock</value></securityTitle>"
            "<transactionDate><value>"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.lit(
            "</value></transactionDate><transactionCoding>"
            "<transactionFormType>4</transactionFormType><transactionCode>"
        ),
        F.col("o_orderstatus"),
        F.lit("</transactionCode><equitySwapInvolved>"),
        (F.col("o_orderkey") % 2).cast("string"),
        F.lit(
            "</equitySwapInvolved></transactionCoding><transactionAmounts>"
            "<transactionShares><value>"
        ),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
        F.lit("</value></transactionShares><transactionPricePerShare><value>"),
        F.col("o_custkey").cast("decimal(12,2)").cast("string"),
        F.lit(
            "</value></transactionPricePerShare>"
            "<transactionAcquiredDisposedCode><value>"
        ),
        F.when(F.col("o_orderkey") % 3 == 0, "A").otherwise("D"),
        F.lit(
            "</value></transactionAcquiredDisposedCode></transactionAmounts>"
            "<postTransactionAmounts><sharesOwnedFollowingTransaction><value>"
        ),
        (F.col("o_orderkey") % 1000).cast("string"),
        F.lit(
            "</value></sharesOwnedFollowingTransaction>"
            "</postTransactionAmounts>"
            "<ownershipNature><directOrIndirectOwnership><value>D</value>"
            "</directOrIndirectOwnership></ownershipNature>"
            "</nonDerivativeTransaction></nonDerivativeTable>"
            "</ownershipDocument>"
        ),
    )
    payload = o.select(accession.alias("accession_number"), xml.alias("xml"))
    out = parse_form4(payload)
    for amount_col in (
        "transaction_shares",
        "transaction_price_per_share",
        "shares_owned_following",
    ):
        out = out.withColumn(amount_col, F.col(amount_col).cast("double"))
    return out


@query(
    "edgar_xbrl_normalize",
    oracle="""
    SELECT c_custkey AS cik, tag, 'USD' AS unit,
      CAST(CAST(CASE WHEN tag = 'Assets'
           THEN CAST(c_acctbal AS DECIMAL(12,2)) * 1000
           ELSE CAST(c_acctbal AS DECIMAL(12,2)) END AS DECIMAL(24,4))
           AS DOUBLE) AS val,
      2020 AS fy, 'FY' AS fp
    FROM customer
    CROSS JOIN (SELECT unnest(['Assets', 'Revenues']) AS tag)
    WHERE c_custkey % 5 = 0
    """,
)
def edgar_xbrl_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/S9 XBRL normalization on the gate: build a companyfacts-shaped
    nested payload per company (facts → taxonomy → tag → units → rows),
    run the production map-of-maps explode chain (the same shape
    sources/rest.read_company_facts scans from files), emit the long
    fact table.  The oracle reconstructs the rows directly.

    Gate output casts ``val`` decimal(24,4) -> double (driver-hash
    decimal-scale contract; see edgar_form4_roundtrip)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    json_payload = F.concat(
        F.lit('{"us-gaap": {"Assets": {"units": {"USD": [{"val": '),
        (bal * 1000).cast("string"),
        F.lit(', "fy": 2020, "fp": "FY"}]}}, "Revenues": {"units": {"USD": [{"val": '),
        bal.cast("string"),
        F.lit(', "fy": 2020, "fp": "FY"}]}}}}'),
    )
    sch = (
        "map<string,map<string,struct<"
        "units:map<string,array<struct<val:decimal(24,4),fy:int,fp:string>>>>>>"
    )
    facts = c.select(
        F.col("c_custkey").alias("cik"),
        F.from_json(json_payload, sch).alias("facts"),
    )
    tax = facts.select("cik", F.explode("facts").alias("taxonomy", "tags"))
    tags = tax.select("cik", F.explode("tags").alias("tag", "body"))
    units = tags.select(
        "cik", "tag", F.explode("body.units").alias("unit", "rows")
    )
    return units.select(
        "cik", "tag", "unit", F.explode("rows").alias("r")
    ).select(
        "cik",
        "tag",
        "unit",
        F.col("r.val").cast("double").alias("val"),
        F.col("r.fy").alias("fy"),
        F.col("r.fp").alias("fp"),
    )


@query(
    "edgar_sgml_roundtrip",
    oracle="""
    SELECT
      '0000000000-24-' || lpad((doc_id % 1000000)::VARCHAR, 6, '0')
        AS accession_number,
      '10-K' AS submission_type,
      doc_id::VARCHAR AS central_index_key,
      1 AS n_docs,
      '10-K' AS doc_type,
      'doc.htm' AS doc_filename,
      CAST(length(COALESCE(text, '')) AS INT) AS text_len
    FROM documents
    """,
)
def edgar_sgml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14/C15 on the gate: build an SGML container per document (header
    with flat + nested keys, one <DOCUMENT> body), parse it with the
    production mapInPandas stage (parsing/meta.parse_filings), and emit
    the recovered header fields and document metadata."""
    from ..parsing.meta import parse_filings

    d = table(spark, sf_dir, "documents")
    accession = F.concat(
        F.lit("0000000000-24-"),
        F.lpad((F.col("doc_id") % 1000000).cast("string"), 6, "0"),
    )
    container = F.concat(
        F.lit("<SEC-DOCUMENT>x.txt : 20240115\n<SEC-HEADER>x.hdr.sgml : 20240115\n"),
        F.lit("ACCESSION NUMBER:\t\t"),
        accession,
        F.lit("\nCONFORMED SUBMISSION TYPE:\t10-K\nFILER:\n\tCOMPANY DATA:\n"),
        F.lit("\t\tCENTRAL INDEX KEY:\t\t\t"),
        F.col("doc_id").cast("string"),
        F.lit("\n</SEC-HEADER>\n<DOCUMENT>\n<TYPE>10-K\n<SEQUENCE>1\n"),
        F.lit("<FILENAME>doc.htm\n<TEXT>\n"),
        # NULL text nulls the whole concat, which would DROP the filing
        # from the parse (one unreadable doc must not vanish silently —
        # POISON.md): a missing body roundtrips as an empty TEXT section
        F.coalesce(F.col("text"), F.lit("")),
        F.lit("\n</TEXT>\n</DOCUMENT>\n</SEC-DOCUMENT>\n"),
    )
    parsed = parse_filings(d.select(container.alias("content")))
    # Header projection and document explode in ONE pass over the
    # mapInPandas output — a self-join here would run the SGML parse
    # twice (each join side re-evaluates the uncached mapInPandas
    # stage; this was 30.5s of the 79.4s round-1 bench at sf0.1).
    return parsed.select(
        "accession_number",
        F.col("metadata")["CONFORMED SUBMISSION TYPE"].alias("submission_type"),
        F.col("metadata")["FILER/COMPANY DATA/CENTRAL INDEX KEY"].alias(
            "central_index_key"
        ),
        F.size("documents").alias("n_docs"),
        F.explode("documents").alias("doc"),
    ).select(
        "accession_number",
        "submission_type",
        "central_index_key",
        "n_docs",
        F.col("doc.type").alias("doc_type"),
        F.col("doc.filename").alias("doc_filename"),
        F.length("doc.text").alias("text_len"),
    )


@query(
    "edgar_uu_roundtrip",
    oracle="""
    SELECT doc_id, text AS recovered
    FROM documents
    """,
)
def edgar_uu_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C19 uudecode on the value gate: uuencode every document's text
    (45-byte b2a_uu lines, the format the reference shells out to the
    stdlib ``uu`` module for, parser.py:117-125), then decode through
    the production UDF and recover the original text byte-for-byte —
    the oracle is simply the source column."""
    from ..parsing.uu import uudecode_udf, uuencode_udf

    d = table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    encoded = d.select(
        "doc_id", uuencode_udf(blob, F.lit("doc.txt")).alias("uu")
    )
    return encoded.select(
        "doc_id",
        F.decode(uudecode_udf("uu"), "UTF-8").alias("recovered"),
    )
