"""Streaming partitioned-parquet sink — idempotent micro-batch loads.

``writeStream.parquet`` appends; a replayed micro-batch (restart after
a crash between sink commit and checkpoint commit) appends its rows
AGAIN — the classic at-least-once duplication.  This sink routes each
micro-batch through ``foreachBatch`` and rewrites ONLY the partitions
the batch touches (dynamic partition overwrite, same mechanism as the
batch mirror's ``sources/index.upsert_parquet_mirror``): replaying a
batch rewrites the same partitions to the same content instead of
duplicating them.

Exactly-once therefore requires batches to be PARTITION-ALIGNED: every
partition is written by a single (possibly replayed) batch — the
natural shape for file-drop feeds (one day-file per trigger → one
day-partition per batch).  When batches straddle partitions, a replay
still converges for the replayed batch but a partition shared by two
DIFFERENT batches keeps only the later batch's rows — the sink
documents rather than hides that contract (the general fix is a MERGE
sink on a table format with row-level upserts, out of scope for plain
parquet).

At scale this is the standard streaming lakehouse loader: each
micro-batch's write is a normal distributed parquet job, partition
columns give downstream readers pruning, and ``sortWithinPartitions``
clusters rows for row-group min/max skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def start_partitioned_parquet_sink(
    stream_df: DataFrame,
    dest: str,
    partition_cols: list[str],
    checkpoint_dir: str,
    sort_cols: list[str] | None = None,
    query_name: str = "parquet_sink",
):
    """foreachBatch sink: per micro-batch, dynamic-overwrite exactly
    the ``partition_cols`` partitions present in the batch."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out = batch_df
            if sort_cols:
                out = out.sortWithinPartitions(*partition_cols, *sort_cols)
            (
                out.write.mode("overwrite")
                .partitionBy(*partition_cols)
                .parquet(dest)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
