"""Form-4 (ownership) XML → flat transaction table (SURVEY §2.8 C16-C17).

The reference extracts 12 regex tag-pairs and zips 10 parallel
match-lists into per-transaction dicts of *strings*
(parser.py:10-25, 269-336).  Spark-first: declare the nested
``ownershipDocument`` schema and let ``from_xml`` build the struct, then
``explode`` the transaction array and project typed columns
(DecimalType shares/prices, DateType dates) — no regex, no Python loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

_VALUE = StructType([StructField("value", StringType())])

TRANSACTION_AMOUNTS = StructType(
    [
        StructField("transactionShares", _VALUE),
        StructField("transactionPricePerShare", _VALUE),
        StructField("transactionAcquiredDisposedCode", _VALUE),
    ]
)

NON_DERIVATIVE_TRANSACTION = StructType(
    [
        StructField("securityTitle", _VALUE),
        StructField("transactionDate", _VALUE),
        StructField("deemedExecutionDate", _VALUE),
        StructField(
            "transactionCoding",
            StructType(
                [
                    StructField("transactionFormType", StringType()),
                    StructField("transactionCode", StringType()),
                    StructField("equitySwapInvolved", StringType()),
                ]
            ),
        ),
        StructField("transactionAmounts", TRANSACTION_AMOUNTS),
        StructField(
            "postTransactionAmounts",
            StructType([StructField("sharesOwnedFollowingTransaction", _VALUE)]),
        ),
        StructField(
            "ownershipNature",
            StructType([StructField("directOrIndirectOwnership", _VALUE)]),
        ),
    ]
)

OWNERSHIP_DOCUMENT = StructType(
    [
        StructField("schemaVersion", StringType()),
        StructField("documentType", StringType()),
        StructField("periodOfReport", StringType()),
        StructField(
            "issuer",
            StructType(
                [
                    StructField("issuerCik", StringType()),
                    StructField("issuerName", StringType()),
                    StructField("issuerTradingSymbol", StringType()),
                ]
            ),
        ),
        StructField(
            "nonDerivativeTable",
            StructType(
                [
                    StructField(
                        "nonDerivativeTransaction",
                        ArrayType(NON_DERIVATIVE_TRANSACTION),
                    )
                ]
            ),
        ),
    ]
)


def _strip_declaration(xml: Column) -> Column:
    """Drop the <?xml …?> prolog and anything before <ownershipDocument>."""
    return F.regexp_extract(xml, r"(?s)(<ownershipDocument>.*</ownershipDocument>)", 1)


def parse_form4(df: DataFrame, xml_col: str = "xml", accession_col: str = "accession_number") -> DataFrame:
    """(accession_number, xml) → FORM4_TRANSACTION rows.

    One ``from_xml`` + one ``explode`` — transactions of all filings
    form a single flat typed table.
    """
    doc = F.from_xml(_strip_declaration(F.col(xml_col)), OWNERSHIP_DOCUMENT)
    tx = df.select(
        F.col(accession_col).alias("accession_number"),
        F.explode(doc.getField("nonDerivativeTable").getField("nonDerivativeTransaction")).alias("t"),
    )
    return tx.select(
        "accession_number",
        F.col("t.securityTitle.value").alias("security_title"),
        F.to_date("t.transactionDate.value").alias("transaction_date"),
        F.col("t.transactionCoding.transactionFormType").alias("transaction_form_type"),
        F.col("t.transactionCoding.transactionCode").alias("transaction_code"),
        (F.col("t.transactionCoding.equitySwapInvolved").cast("int") == 1).alias(
            "equity_swap_involved"
        ),
        F.col("t.transactionAmounts.transactionShares.value")
        .cast("decimal(18,4)")
        .alias("transaction_shares"),
        F.col("t.transactionAmounts.transactionPricePerShare.value")
        .cast("decimal(18,4)")
        .alias("transaction_price_per_share"),
        F.col("t.transactionAmounts.transactionAcquiredDisposedCode.value").alias(
            "acquired_disposed_code"
        ),
        F.col("t.postTransactionAmounts.sharesOwnedFollowingTransaction.value")
        .cast("decimal(18,4)")
        .alias("shares_owned_following"),
        F.col("t.ownershipNature.directOrIndirectOwnership.value").alias(
            "direct_or_indirect_ownership"
        ),
    )
