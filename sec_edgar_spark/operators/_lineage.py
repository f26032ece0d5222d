"""Lineage cut for iterative operators — local by default, RELIABLE on
demand.

Every iterative operator here (connected components, label
propagation, k-core, PageRank/PPR, parallel global rank, the SCD2
stream's state fold) must truncate its plan each round or the executed
plan grows with the iteration count.  ``localCheckpoint()`` does that
at zero I/O cost, but its blocks live only in executor storage: on a
real cluster an executor loss DELETES them, and Spark cannot recompute
truncated lineage — the whole job dies and restarts from zero.  At
100 TB on thousands of executors, losing one executor during a 20-round
components run is an expected event, not a corner case.

So the cut is a policy switch, not a hardcoded call:

- default: ``df.localCheckpoint()`` — right for local[] runs, tests,
  and the driver gate, where executors cannot be lost independently
  of the job.
- ``spark.sec_edgar.checkpoint_dir`` set (any Hadoop-visible path —
  HDFS/S3A/local): ``df.checkpoint()`` to that directory — survives
  executor loss; each round's table is re-readable by ANY executor.
  The SparkContext checkpoint dir is set lazily on first use.

Both paths are eager (the round's shuffle is materialized exactly
once) and produce bit-identical results — asserted by
tests/test_graph.py::test_reliable_checkpoint_path_matches_local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


CHECKPOINT_DIR_CONF = "spark.sec_edgar.checkpoint_dir"


def lineage_cut(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    Uses reliable ``checkpoint()`` when ``spark.sec_edgar.checkpoint_dir``
    is set (production: survives executor loss), else
    ``localCheckpoint()`` (local runs: zero I/O).
    """
    spark = df.sparkSession
    ckpt_dir = spark.conf.get(CHECKPOINT_DIR_CONF, "")
    if not ckpt_dir:
        return df.localCheckpoint()
    sc = spark.sparkContext
    # setCheckpointDir nests a per-context UUID subdir under the given
    # path (and getCheckpointDir returns it scheme-qualified), so track
    # what we last set ourselves — re-setting every call would fan out
    # a new subdir per round.
    if getattr(sc, "_sec_edgar_ckpt_dir", None) != ckpt_dir:
        sc.setCheckpointDir(ckpt_dir)
        sc._sec_edgar_ckpt_dir = ckpt_dir
    return df.checkpoint()
