"""Streaming decontamination gate — the intake-time twin of
operators/sampling.decontaminate.

A training-document stream is checked against a STATIC eval-set
shingle index as it arrives (the moment a crawl drop lands, before it
reaches the corpus), instead of by a batch sweep after the fact:

- the incoming doc explodes into its distinct word n-grams — a
  stateless transform, streaming-safe;
- a STREAM-STATIC inner join probes the eval shingle index (static
  side; Spark re-plans it per micro-batch, so a refreshed eval set is
  picked up without restarting the query) — at scale the index is a
  broadcast when it fits and a shuffle-hash join otherwise, exactly
  the batch operator's shape;
- a watermarked per-(window, doc) count aggregates the overlap —
  append-mode capable, state expires with the watermark.

Emitted rows are the CONTAMINATED docs (doc_id, window, overlap
count); anti-join the intake stream against this in the sink to get
the clean feed — same division of labor as the batch pair
(decontaminate flags, the pipeline anti-joins).

Parity contract (tests/test_streaming_decontam.py): streaming the
corpus through in waves flags exactly the docs the batch
decontaminate flags, with identical overlap counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def eval_shingle_index(
    eval_df: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """The static probe index: distinct word ``n``-grams of the eval
    set, one row per shingle.  Build once (or refresh on a schedule);
    the stream probes it per micro-batch.  The token array is
    materialized in its own projection before the shingle lambda (the
    HOF recompute trap — see shingles_from_tokens)."""
    return (
        eval_df.select(T.tokens(text_col).alias("_toks"))
        .select(
            F.explode(T.shingles_from_tokens(F.col("_toks"), n)).alias(
                "shingle"
            )
        )
        .distinct()
    )


def decontam_stream(
    docs: DataFrame,
    eval_index: DataFrame,
    id_col: str = "doc_id",
    ts_col: str = "ts",
    text_col: str = "text",
    n: int = 8,
    watermark: str = "1 hour",
    window: str = "1 day",
) -> DataFrame:
    """document stream → (window, doc_id, n_overlapping_shingles) of
    contaminated docs.  ``eval_index`` is the static frame from
    :func:`eval_shingle_index` (one ``shingle`` column)."""
    # Watermark at the HEAD of the stream, before the explode/join:
    # the event-time tracker only sees rows that reach its operator,
    # so a watermark placed after the inner join would never advance
    # on batches whose docs all miss the index (clean intake periods —
    # the common case) and the append-mode aggregate would never
    # flush.  Upstream placement tracks every arriving doc.
    sh = (
        docs.withWatermark(ts_col, watermark)
        .select(
            F.col(id_col), F.col(ts_col), T.tokens(text_col).alias("_toks")
        )
        .select(
            F.col(id_col),
            F.col(ts_col),
            F.explode(T.shingles_from_tokens(F.col("_toks"), n)).alias(
                "shingle"
            ),
        )
    )
    hits = sh.join(eval_index, "shingle")  # stream-static inner join
    return (
        hits.groupBy(F.window(ts_col, window).alias("w"), F.col(id_col))
        .agg(F.count("*").alias("n_overlapping_shingles"))
        .select(
            F.col("w.start").alias("window_start"),
            id_col,
            "n_overlapping_shingles",
        )
    )
