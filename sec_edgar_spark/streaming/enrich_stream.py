"""Stream-static join — dimension enrichment of a live stream.

Completes the streaming join matrix (stream-stream interval join lives
in join_stream.py): each micro-batch of events joins the STATIC
customer dimension and rolls up per market segment.  Spark plans the
static side as a broadcast into every micro-batch — the dimension is
re-resolved per trigger (a restarted query or a refreshed underlying
table picks up dimension changes; rows are NOT stale snapshots from
query start), and the stream side never shuffles for the join.

That is exactly the 100 TB enrichment shape: facts stream through,
dimensions broadcast, and the stateful part (the windowed rollup)
keys on low-cardinality enriched attributes so state stays tiny.

Parity contract (tests/test_streaming_enrich.py): the complete-mode
snapshot over N files equals the batch join+rollup over the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def enrich_rollup(events: DataFrame, customers: DataFrame) -> DataFrame:
    """events (ts, user_id, event_type, value) ⋈ static customers
    (c_custkey, c_mktsegment) → per-(segment, event_type) totals.

    Works for both a streaming and a batch ``events`` frame — the
    parity test runs the SAME function on both sides.
    """
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        events.join(broadcast(dim), "user_id", "left")
        .groupBy(F.coalesce("segment", F.lit("UNKNOWN")).alias("segment"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def run_to_memory_sink(
    events: DataFrame, customers: DataFrame, query_name: str = "enriched"
):
    return (
        enrich_rollup(events, customers)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
