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

Checkpoint-file retention: Spark deletes reliable checkpoint data only
at context shutdown by default, so a 20-round iterative job would
accumulate 20 full materialized copies under the checkpoint dir.  The
session factory therefore sets
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (session.py)
— the ContextCleaner then removes a round's files once its DataFrame is
garbage-collected, i.e. as soon as the next round's cut supersedes it.
Caller-owned sessions that enable ``spark.sec_edgar.checkpoint_dir``
must set the same core conf at context build or budget for
rounds × |table| of checkpoint storage.  Unbounded CONTINUOUS callers
(a per-micro-batch cut inside a stream, where even GC-paced cleanup
lags an always-on writer) should pass ``local_only=True``: a stream
whose batches are idempotently replayable (streaming/scd_stream.py —
sink markers + strictly-newer filters) gets crash recovery from replay,
not from checkpoint durability, so reliable files buy nothing there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


CHECKPOINT_DIR_CONF = "spark.sec_edgar.checkpoint_dir"


def lineage_cut(
    df: DataFrame, local_only: bool = False, eager: bool = True
) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    Uses reliable ``checkpoint()`` when ``spark.sec_edgar.checkpoint_dir``
    is set (production: survives executor loss), else
    ``localCheckpoint()`` (local runs: zero I/O).  ``local_only=True``
    forces ``localCheckpoint()`` regardless of the conf — for call
    sites whose durability comes from an idempotent replay protocol
    (see module docstring) and which would otherwise write a full
    reliable copy per micro-batch, forever.

    ``eager=False`` (r13) defers materialization to the caller's next
    action while still truncating the PLAN immediately (the returned
    frame is a LogicalRDD either way, so Catalyst analysis stays O(1)
    deep across loop rounds).  Iterative drivers use it to fold the
    per-round checkpoint job into the action they were about to run
    anyway (a convergence count), or — in fixed-iteration loops with
    no per-round action — to collapse ALL rounds into the final job.
    Only honored on the localCheckpoint path: a lazy RELIABLE
    checkpoint recomputes the RDD a second time to write it (Spark
    semantics without a persist), so the production path stays eager.
    """
    spark = df.sparkSession
    ckpt_dir = "" if local_only else spark.conf.get(CHECKPOINT_DIR_CONF, "")
    if not ckpt_dir:
        return df.localCheckpoint(eager=eager)
    sc = spark.sparkContext
    # setCheckpointDir nests a per-context UUID subdir under the given
    # path (and getCheckpointDir returns it scheme-qualified), so track
    # what we last set ourselves — re-setting every call would fan out
    # a new subdir per round.
    if getattr(sc, "_sec_edgar_ckpt_dir", None) != ckpt_dir:
        sc.setCheckpointDir(ckpt_dir)
        sc._sec_edgar_ckpt_dir = ckpt_dir
    return df.checkpoint()
