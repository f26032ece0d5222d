"""Multimodal plumbing as an oracle-checked query.

The documents table's text re-cast to a binary blob column stands in
for media bytes: the query exercises the REAL multimodal path —
binary column → Arrow-batched mapInPandas metadata pass (format sniff,
byte length, header dims) — with values the oracle can reproduce
(word-soup bytes sniff to 'unknown', n_bytes = octet_length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.multimodal import decode_image_meta
from .registry import query


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
      CASE WHEN octet_length(CAST(text AS BLOB)) = 0 THEN NULL
           ELSE 'unknown' END AS format,
      CAST(NULL AS INT) AS width,
      CAST(NULL AS INT) AS height,
      CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass over mapInPandas (the decode-stage
    plumbing; swapping the header sniffer for a codec is a one-function
    change — operators/multimodal.py)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    return decode_image_meta(d, "blob").select(
        "doc_id", "format", "width", "height", "n_bytes"
    )
