"""Streaming HyperLogLog — bounded-state distinct counting on a stream.

The batch HLL (operators/sketches.py) keeps one integer weight per
register, reduced with ``min`` — and ``min`` is a streaming-safe
monotone aggregate, so the identical register computation runs under
Structured Streaming in update mode with O(groups × 16) state,
regardless of stream length or key cardinality.  That is the whole
point of sketching on a stream: exact COUNT(DISTINCT) state grows with
cardinality; the sketch's state does not.

The register table IS the queryable result (memory/Delta sink);
``hll_estimate`` (batch) folds any snapshot of it into estimates —
the same split as count-min's build/estimate.  Estimates from a
snapshot equal the batch estimate over the same prefix of data
bit-for-bit (parity-tested in tests/test_streaming_hll.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.sketches import hll_register_weights


def hll_register_stream(
    events: DataFrame, group_cols: list[str], item_col
) -> DataFrame:
    """Streaming (group..., bucket, w) register frame — pass a
    streaming DataFrame; the groupBy(min) runs incrementally in update
    mode.  No watermark: registers are tiny and never expire (a
    windowed variant would add the event-time window to group_cols and
    a watermark, same shape as the daily-feed rollup)."""
    return hll_register_weights(events, group_cols, item_col)


def run_to_memory_sink(
    events: DataFrame,
    group_cols: list[str],
    item_col,
    query_name: str = "hll_registers",
):
    """Start the register stream into a memory sink for tests/ad hoc."""
    regs = hll_register_stream(events, group_cols, item_col)
    return (
        regs.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
