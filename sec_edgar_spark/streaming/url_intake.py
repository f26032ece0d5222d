"""Streaming URL-canonicalization intake gate — the ingestion-time
twin of the batch ``dedup_url_canonical`` query: crawl frontiers and
re-crawl feeds arrive as URL streams, and the first dedup decision in
any web pipeline happens HERE, before a single page body is fetched.

Canonicalization is the SAME codegen expression the batch query uses
(functions/text.canonicalize_url — one shared definition, no drift),
then ``dropDuplicatesWithinWatermark`` keyed on the canonical form
keeps the first arrival per canonical URL and expires state with the
event-time watermark (bounded state, the dedup_stream pattern).  An
optional static known-set (the already-crawled canonical table) is
removed with a stream-static LEFT ANTI join — the decontamination
gate's join shape, free of state entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import canonicalize_url


def url_intake_stream(
    urls: DataFrame,
    known_canonicals: DataFrame | None = None,
    ts_col: str = "ts",
    url_col: str = "url",
    watermark: str = "1 hour",
) -> DataFrame:
    """URL stream → first-seen-only canonical-URL stream.

    ``known_canonicals``: optional STATIC frame with one column
    ``canonical_url`` (the persisted crawl ledger); stream rows whose
    canonical form is already in it are dropped before any state is
    keyed.
    """
    canon = urls.withColumn(
        "canonical_url", canonicalize_url(F.col(url_col))
    ).withWatermark(ts_col, watermark)
    if known_canonicals is not None:
        canon = canon.join(
            known_canonicals.select("canonical_url"),
            "canonical_url",
            "left_anti",
        )
    return canon.dropDuplicatesWithinWatermark(["canonical_url"])
