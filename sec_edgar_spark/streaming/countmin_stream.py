"""Streaming count-min sketch — bounded-state frequency estimation on
a stream (the heavy-hitter primitive when exact per-token counts are
too much state).

The batch sketch (operators/sketches.countmin_build) is a posexplode →
groupBy(row, bucket).count() — counting is an incremental streaming
aggregate, so the IDENTICAL computation runs under Structured
Streaming in update mode with state bounded at depth × width rows
FOREVER, regardless of stream length or vocabulary growth.  Exact
streaming word-count state grows with the vocabulary; the sketch's
does not — the same state-bound argument as the streaming HLL.

The sketch table IS the queryable result; ``countmin_estimate``
(batch) folds any snapshot of it into frequency estimates for a probe
set, upper bounds with the standard ε=e/width guarantee.  A snapshot's
estimates equal the batch sketch over the same prefix of the stream
bit-for-bit (parity-tested in tests/test_streaming_countmin.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.sketches import countmin_build


def countmin_stream(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Streaming (row, bucket, cnt) sketch frame — pass a streaming
    DataFrame of one item occurrence per row; the count runs
    incrementally in update mode.  No watermark: the sketch is tiny
    and never expires (a windowed variant adds the event-time window
    to the group key plus a watermark, like the daily-feed rollup)."""
    return countmin_build(items, item_col, depth=depth, width=width)


def run_to_memory_sink(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    query_name: str = "cms_sketch",
):
    """Start the sketch stream into a memory sink for tests/ad hoc.

    Update-mode memory sinks accumulate every emitted version of a
    cell; counts only grow, so fold a snapshot with MAX(cnt) per
    (row, bucket) to recover the current sketch.
    """
    sk = countmin_stream(items, item_col, depth=depth, width=width)
    return (
        sk.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
