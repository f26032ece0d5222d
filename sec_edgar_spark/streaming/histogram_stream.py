"""Streaming value histogram — incremental distribution profiling.

The batch twin (``events_value_histogram``) derives its bucket bounds
from the data's global min/max; a stream can't know those, so the
streaming variant takes FIXED bounds (from a prior batch profile or a
domain contract) and counts bucket membership incrementally — counts
are streaming-safe additive aggregates, state is O(n_buckets) (the
memory-sink runner below runs in COMPLETE mode so every snapshot is
the full ≤n_buckets histogram; an update-mode sink sees only changed
buckets, same state size), and values outside the bounds clamp into the
edge buckets (they'd silently vanish otherwise, which is exactly the
drift signal a monitor wants to see).

The bucket expression is IDENTICAL to the batch one given the same
bounds, so a snapshot equals the batch histogram over the same prefix
(parity-tested in tests/test_streaming_histogram.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_expr(value: Column, lo: float, hi: float, n_buckets: int) -> Column:
    if not hi > lo:
        raise ValueError(f"histogram bounds need hi > lo, got lo={lo} hi={hi}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    width = (hi - lo) / n_buckets
    raw = F.floor((value - F.lit(lo)) / F.lit(width))
    return F.greatest(
        F.lit(0), F.least(raw, F.lit(n_buckets - 1))
    ).cast("bigint")


def histogram_stream(
    events: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
) -> DataFrame:
    """events stream → (bucket, n) incremental counts (update mode)."""
    v = F.col(value_col).cast("double")
    return (
        events.select(bucket_expr(v, lo, hi, n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def run_to_memory_sink(
    events: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
    query_name: str = "hist",
):
    h = histogram_stream(events, value_col, lo, hi, n_buckets)
    return (
        h.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
