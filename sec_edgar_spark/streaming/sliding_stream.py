"""Streaming sliding-window rollup — the incremental twin of
``events_sliding_daily`` (queries/events.py).

Same window spec as the batch query: 2-day windows advancing 1 day,
so every event belongs to exactly two windows and each day gets a
trailing-48h view.  ``F.window(ts, '2 days', '1 day')`` expands each
micro-batch's rows to their member windows JVM-side and the counts /
decimal sums are additive streaming aggregates; with a watermark the
state store holds only the windows still inside the lateness horizon
(watermark + 2 days of open windows), NOT the full history — that is
what makes the operator runnable forever at 100 TB/day.

``n_users`` is the one non-additive batch column: exact COUNT(DISTINCT)
needs per-window user sets, which streaming agg forbids.  The stream
carries ``approx_count_distinct`` instead (HLL++, mergeable constant
state per window; identical to the batch ``approx_count_distinct`` on
the same rows because HLL register merges are order-insensitive) —
parity-tested both ways in tests/test_streaming_sliding.py.

The memory-sink runner below snapshots in COMPLETE mode so a snapshot
equals the batch rollup over everything ingested so far; a production
sink would run update/append with the watermark bounding state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_rollup(events: DataFrame, watermark: str = "3 days") -> DataFrame:
    """events stream (ts, event_type, user_id, value) → per-(window,
    type) counts, approx users, decimal-exact value sum."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("win_start"),
            F.col("w.end").cast("date").alias("win_end"),
            "event_type",
            "n_events",
            "n_users_approx",
            "total_value",
        )
    )


def run_to_memory_sink(events: DataFrame, query_name: str = "sliding"):
    return (
        sliding_rollup(events)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
