"""Table maintenance: small-file compaction for parquet layouts.

The 100 TB problem: streaming sinks and frequent incremental loads
(streaming/parquet_sink.py, scd_stream.py) accrete thousands of tiny
files per partition; every downstream scan then pays per-file open
cost and the scheduler drowns in splits.  Periodic compaction rewrites
each oversized file-count into few size-targeted files.

Plain-parquet pattern (Delta/Iceberg ship this as OPTIMIZE /
rewrite_data_files): read → coalesce to ceil(bytes/target) → write to
a staging dir → atomic-ish swap.  The rewrite is partition-parallel
and reads each byte once.

Scope: FLAT parquet directories only.  A hive-partitioned tree
(``k=v`` subdirectories, e.g. the streaming parquet_sink layout) must
be compacted per-partition-directory — a whole-tree rewrite would
flatten the layout and break partition pruning — so
:func:`compact_parquet` detects that layout and refuses.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the parquet files under ``path``."""
    n = b = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                b += os.path.getsize(os.path.join(root, f))
    return n, b


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_bytes)`` files (floor 1).  Returns the
    new file count.  Uses write-to-staging + swap so a failed rewrite
    never destroys the source; readers never see a MIX of old and new
    files, but there IS a brief window between the two renames where no
    directory exists at ``path`` (plain filesystems have no atomic
    directory exchange — concurrent readers should retry, or use a
    table format with snapshot isolation).  Crash recovery: a crash
    after the first rename leaves the data intact at ``.pre-compact``;
    this function restores it on the next run (stale ``.compacting``
    staging is discarded, a stale backup is moved back before
    compacting resumes)."""
    staging = path.rstrip("/") + ".compacting"
    backup = path.rstrip("/") + ".pre-compact"
    # Recover from a previous crashed run FIRST (path may not even
    # exist yet): a leftover backup means the crash hit between the two
    # renames — the backup IS the data; restore it.  Leftover staging
    # is a partial write — discard it (the overwrite below would also
    # fail on it via rename collision on some filesystems).
    if os.path.isdir(backup):
        if os.path.isdir(path):
            shutil.rmtree(backup)  # swap completed; backup is residue
        else:
            os.rename(backup, path)
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    partition_dirs = [
        d
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d)) and "=" in d
    ]
    if partition_dirs:
        raise ValueError(
            f"{path} is hive-partitioned ({partition_dirs[0]}/...): "
            "compact each partition directory individually — a "
            "whole-tree rewrite would flatten the layout"
        )
    n_files, total = dir_stats(path)
    n_out = max(1, -(-total // target_bytes))
    if n_files <= n_out:
        return n_files
    df = spark.read.parquet(path)
    # coalesce, not repartition: no shuffle — input splits merge 1:N
    df.coalesce(n_out).write.mode("overwrite").parquet(staging)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    n_after, _ = dir_stats(path)
    return n_after
