"""Streaming deduplication (the ingestion-time guard of the dedup
family — EDGAR republishes corrected filings; training pipelines see
re-crawled documents).

``dropDuplicatesWithinWatermark`` keys state by content hash and
expires it with the event-time watermark, so state stays bounded — the
streaming twin of `operators/dedup.dedup_exact`'s batch hash-groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """documents stream → first-seen-only stream (exact content dedup).

    Duplicate = identical normalized content hash within the watermark
    horizon; later copies are dropped, state for old hashes expires.
    """
    hashed = docs.withColumn(
        "content_hash", F.md5(F.lower(F.trim(F.col(text_col))))
    ).withWatermark(ts_col, watermark)
    return hashed.dropDuplicatesWithinWatermark(["content_hash"])
