"""Streaming/incremental ridge training — mergeable sufficient
statistics over foreachBatch.

Because a linear model's sufficient statistics (operators/ridge.py
ridge3_stats) MERGE by columnwise addition, continuous training is an
append-only log: each micro-batch appends ONE row
``(batch_id, n, sx1, …, sx2y)`` to ``<root>/stats/``, and the current
model is ``solve(Σ stats)`` at read time.  This layout is naturally
exactly-once: a replayed batch appends a bit-identical row with the
same batch_id, and the read-side first-wins dedup on batch_id absorbs
it — no torn-write window exists at all (contrast the SCD2 sink,
which must guard a read-modify-write).  The optional marker only
short-circuits replays.

The model is always consistent with exactly the data ingested so far,
at any corpus size, with per-batch cost of one aggregate row — the
streaming counterpart of the batch trainer's one-pass property.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ridge import STAT_COLS, ridge3_solve, ridge3_stats
from .exactly_once import already_processed, write_batch_marker
from .store import store_exists

_STATS_SCHEMA = "batch_id long, " + ", ".join(
    f"{c} long" for c in STAT_COLS
)


def ridge_accumulate_batch(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    batch_id: int,
    x1: str = "x1",
    x2: str = "x2",
    y: str = "y",
) -> None:
    """Append this batch's sufficient-statistics row (idempotent under
    replay via batch_id)."""
    if already_processed(root, batch_id):
        return
    if not batch.isEmpty():
        stats = ridge3_stats(
            batch, F.col(x1), F.col(x2), F.col(y)
        ).withColumn("batch_id", F.lit(batch_id))
        stats.select("batch_id", *STAT_COLS).write.mode("append").parquet(
            f"{root}/stats"
        )
    write_batch_marker(root, batch_id)


def read_model(spark: SparkSession, root: str, lam: int = 1) -> DataFrame:
    """The current weights: dedup per-batch rows (replay residue),
    merge by columnwise sum, Cramer-solve."""
    path = f"{root}/stats"
    if not store_exists(path):
        raise FileNotFoundError(f"no statistics ingested yet under {path}")
    rows = spark.read.schema(_STATS_SCHEMA).parquet(path).dropDuplicates(
        ["batch_id"]
    )
    merged = rows.agg(
        *[F.sum(c).alias(c) for c in STAT_COLS]
    )
    return ridge3_solve(merged, lam)


def run_ridge_maintenance(
    feats: DataFrame,
    root: str,
    checkpoint: str,
    query_name: str = "ridge_maintenance",
    **kwargs,
):
    """Wire a streaming features frame (x1, x2, y integer columns) into
    the stats log via foreachBatch."""
    spark = feats.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ridge_accumulate_batch(
            spark, root, batch_df, batch_id, **kwargs
        )

    return (
        feats.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )
