"""Streaming ingestion-quality pipeline (training-data intake).

A document stream (crawl output, feed drops) passes the SAME quality
operators the batch path uses — token/char statistics, quality
predicate, language ID are all stateless column expressions from
``operators/text_analysis`` / ``functions/text``, so they lift to
Structured Streaming unchanged.  Stateful stages compose after:
exact dedup within the watermark horizon (dedup_stream) and a
windowed per-language intake rollup.

Batch/stream parity is the test contract: running the stream over N
files must equal the batch pipeline over the same files
(tests/test_streaming_quality.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def quality_columns(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless quality columns — identical expression set for batch
    and stream (char-level stats; no explode, so it stays valid under
    any output mode)."""
    n_tokens = T.token_count(text_col)
    n_chars = F.length(text_col)
    alpha_ratio = T.alpha_chars(text_col).cast("double") / F.greatest(
        n_chars, F.lit(1)
    )
    return docs.select(
        "*",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_measured"),
        alpha_ratio.alias("alpha_ratio"),
        ((n_tokens >= 10) & (alpha_ratio > 0.5)).alias("passes_quality"),
    )


def quality_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
    dedup: bool = True,
) -> DataFrame:
    """documents stream → quality-annotated, optionally deduped stream.

    Stateless quality columns first (cheap, prunes early); then exact
    content dedup with watermark-bounded state.  Filter
    ``passes_quality`` downstream — the flag is kept as a column so
    rejected docs can route to a quarantine sink instead of vanishing.
    """
    out = quality_columns(docs, text_col)
    if dedup:
        out = (
            out.withColumn(
                "content_hash", F.md5(F.lower(F.trim(F.col(text_col))))
            )
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_hash"])
        )
    return out


def intake_rollup(
    quality: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    window: str = "1 day",
) -> DataFrame:
    """Windowed intake metrics per (window, passes_quality): doc count
    and token volume — the monitoring rollup a training-data pipeline
    alerts on.  Watermarked tumbling window → append-mode capable,
    state expires."""
    return (
        quality.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "passes_quality")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "passes_quality",
            "n_docs",
            "total_tokens",
        )
    )
