"""Input-bytes-derived shuffle-partition sizing (VERDICT r12 #1).

BENCH_SF100 found and named the repo's one genuine third-decade wall:
at the gate-scale default of 32 shuffle partitions,
``dedup_containment_capped`` measured 14.4×/decade sf10→sf100 —
per-task shuffle input grows 10× at a fixed partition count and
crosses from in-memory sort into spill-merge superlinearity.  Scaling
partitions to the data (128 initial; AQE still coalesces small
stages) restored ~6-7×/decade.  Until this module, that fix lived in
the bench script's conf — a documentation rule, not engine behavior.

This module is the engine rule.  It applies the same statistics
discipline as the key-heat probe (operators/heat.py): read cheap
dataset statistics at plan-build time and make the physical choice
per dataset, automatically.

The rule
--------
``suggest_shuffle_partitions(nbytes)`` keeps **per-task shuffle input
roughly constant as data grows**: partitions = next power of two ≥
``nbytes / bytes_per_partition``, clamped to ``[lo, hi]``.

- ``bytes_per_partition`` defaults to 6 MiB of *compressed parquet
  input*.  Calibration is the measured sf100 pin: the sf100 documents
  table (~792 MB) must land on 128 partitions — the setting
  BENCH_SF100 measured as restoring linearity — while the sf10
  table (~80 MB) stays at the session floor.  Compressed text
  expands ~5-10× into exploded posting-list shuffle rows, so 6 MiB of
  input ≈ 30-60 MB of shuffle per task: safely inside an executor
  thread's sort buffer at 128 GiB / 32 threads, the same
  size-partitions-to-executor-memory arithmetic a 100 TB deployment
  runs.
- Power-of-two rounding makes the decision stable under small
  file-size jitter (a dataset re-write that changes bytes by a few
  percent never flips the plan).
- ``hi`` (4096) is a runaway guard for the local harness; a real
  cluster raises it with executor count.

Session integration (``autosize_shuffle``)
------------------------------------------
Called by ``catalog.table`` on every table load, so EVERY consumer —
driver gate, bench, scale tools — gets data-scaled shuffles with no
per-run conf:

- the **floor is the session's own configured value** (captured on
  first touch): a session built with ``shuffle_partitions=4`` (plan
  audits) or the 32-partition gate default is never *lowered* and
  only raised when a genuinely large table is scanned.  The r12
  measurement that a blanket 128 default slows the many-small-query
  gate scale past its timeout is why the floor is the session's
  choice, not a global constant.
- the effective value for a dataset is the max suggestion over the
  tables of that dataset the session has actually scanned — i.e. a
  query is sized to the largest table it reads, which is what drives
  its shuffle volume.  Per-dataset state means switching between a
  big and a small dataset in one session re-sizes each way (no
  ratchet).
- operator override wins: an explicit ``SPARK_GRAFT_SHUFFLE`` env pin
  or ``spark.sec_edgar.autosize_shuffle=false`` disables autosizing
  entirely.

Statistics are read live (one ``os.scandir`` per table touch, ~0.1 ms
for a ≤64-file dataset) rather than memoized, so an in-place dataset
rewrite can never serve a stale size — the failure mode ADVICE r12
flagged for the heat cache does not exist here by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

BYTES_PER_PARTITION_DEFAULT = 6 * 1024 * 1024
# Target for DIRECTLY-ESTIMATED shuffle bytes (operator-level sizing,
# autosize_for_shuffle_bytes).  Calibrated by the r13 sf100 partition
# sweep on the posting-cap candidate exchange (19.7 GB of pair rows):
# 128 partitions = 385 s with 24 GB of sort spill; 512 = 342 s cold /
# no spill (the sweet spot); 1024 grazed the 8 GiB local heap; 4096
# REGRESSED 39% task-time — bucket over-provisioning defeats map-side
# combine (the same exchange wrote 44 GB at 4096).  128 MiB of
# estimated shuffle per task lands that operator's estimate
# (1-2e9 pairs × 32 B, a ≤2× upper bound on the measured volume) on
# 512 at sf100 and the session floor at gate scale, and is still
# comfortably inside an executor thread's sort budget at
# 128 GiB / 32 threads.
SHUFFLE_BYTES_PER_PARTITION_DEFAULT = 128 * 1024 * 1024
HI_DEFAULT = 4096

_STATE_ATTR = "_sec_edgar_autosize_state"


def table_bytes(path: str) -> int:
    """Total on-disk bytes of a parquet table (single file or a
    directory of part files; one level — Spark writes flat dirs).
    Unreadable/remote paths → 0 (autosizing silently stands down;
    the session floor still applies)."""
    try:
        if os.path.isfile(path):
            return os.stat(path).st_size
        total = 0
        with os.scandir(path) as it:
            for e in it:
                try:
                    total += e.stat().st_size
                except OSError:
                    pass
        return total
    except OSError:
        return 0


def suggest_shuffle_partitions(
    nbytes: int,
    bytes_per_partition: int = BYTES_PER_PARTITION_DEFAULT,
    lo: int = 1,
    hi: int = HI_DEFAULT,
) -> int:
    """Pure sizing rule: next power of two ≥ nbytes/bytes_per_partition,
    clamped to [lo, hi].  Monotone in nbytes; stable under small jitter
    (power-of-two rounding)."""
    if bytes_per_partition <= 0:
        raise ValueError("bytes_per_partition must be positive")
    need = max(1, -(-max(nbytes, 0) // bytes_per_partition))  # ceil div
    p = 1
    while p < need:
        p *= 2
    return max(lo, min(p, hi))


def autosize_shuffle(
    spark: SparkSession,
    sf_dir: str,
    table_path: str | None = None,
    bytes_per_partition: int = BYTES_PER_PARTITION_DEFAULT,
    hi: int = HI_DEFAULT,
) -> int | None:
    """Size ``spark.sql.shuffle.partitions`` for the dataset being
    scanned; returns the effective value (None = autosizing disabled).

    Effective value = max(session floor, largest per-table suggestion
    seen for this ``sf_dir``).  The floor is the session's configured
    partitions at first touch, so explicit operator choices are only
    ever raised for genuinely large data, never lowered or globally
    ratcheted.
    """
    state = _state(spark)
    if state is None:
        return None
    if table_path is not None:
        s = suggest_shuffle_partitions(
            table_bytes(table_path), bytes_per_partition, lo=1, hi=hi
        )
        if s > state["sugg"].get(sf_dir, 0):
            state["sugg"][sf_dir] = s
    return _apply(spark, state, sf_dir)


def autosize_for_shuffle_bytes(
    spark: SparkSession,
    sf_dir: str | None,
    est_shuffle_bytes: int,
    bytes_per_partition: int = SHUFFLE_BYTES_PER_PARTITION_DEFAULT,
    hi: int = HI_DEFAULT,
) -> int | None:
    """Operator-level sizing (r13): raise the dataset's shuffle
    suggestion from an operator's OWN shuffle-volume estimate.

    The input-bytes rule (``autosize_shuffle``) cannot see shuffle
    amplification: the posting-cap candidate join shuffles ~25× its
    input table at sf100 (19.7 GB of pairs off a 792 MB scan — r13
    decomposition), so a table-sized partition count left 154 MB/task
    and 24 GB of spill.  Operators that can BOUND their shuffle volume
    from the statistics they already probe (the exact token-df probe:
    candidate pairs ≤ Σ min(df, L)²) report it here; the suggestion
    joins the same per-dataset state — floor preserved, max over all
    demands, no cross-dataset ratchet, same env/conf kill switches —
    so gate-scale estimates (well under one partition's budget) change
    nothing.  ``sf_dir`` None (no dataset identity available) is a
    no-op."""
    if sf_dir is None:
        return None
    state = _state(spark)
    if state is None:
        return None
    s = suggest_shuffle_partitions(
        est_shuffle_bytes, bytes_per_partition, lo=1, hi=hi
    )
    if s > state["sugg"].get(sf_dir, 0):
        state["sugg"][sf_dir] = s
    return _apply(spark, state, sf_dir)


RANGE_BYTES_PER_PARTITION_DEFAULT = 16 * 1024 * 1024


def plan_bytes(df) -> int | None:
    """Catalyst's estimated size of a DataFrame's optimized plan, in
    bytes (``sizeInBytes`` statistics — file-size-derived for scans,
    width-scaled for projections; never triggers a job).  None when the
    estimate is unavailable."""
    try:
        b = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        return b if b >= 0 else None
    except Exception:
        return None


def range_parts(
    df,
    bytes_per_partition: int = RANGE_BYTES_PER_PARTITION_DEFAULT,
) -> int:
    """Partition count for an EXPLICIT repartition (range or hash) that
    AQE cannot coalesce: sized by the plan's estimated input bytes and
    clamped to ``[1, defaultParallelism]`` (VERDICT r13 #1).

    The historical choice — ``defaultParallelism`` unconditionally —
    made tiny-frame operators pay per-task scheduling overhead
    PROPORTIONAL TO CORE COUNT (a 2 000-row rank sharded 32 ways runs
    3 stages × 32 tasks of microsecond work; the r13 driver measured
    the battery's 32-core leg losing to its own 8-core leg on exactly
    these shapes).  Catalyst's estimate is conservative without CBO
    (filters don't shrink it), so genuinely large inputs keep the full
    ``defaultParallelism`` — behavior unchanged at scale — while
    provably-small frames stop fanning out.  A real deployment that
    range-sorts multi-TB frames raises the ceiling with executor
    count; the clamp ceiling here is the session's own parallelism,
    the same operator-owned choice as before."""
    par = df.sparkSession.sparkContext.defaultParallelism
    b = plan_bytes(df)
    if b is None:
        return par
    need = -(-b // max(bytes_per_partition, 1))  # ceil div
    return max(1, min(par, need))


def _state(spark: SparkSession) -> dict | None:
    """Shared autosize state, or None when autosizing is disabled
    (explicit SPARK_GRAFT_SHUFFLE pin / conf kill switch)."""
    if "SPARK_GRAFT_SHUFFLE" in os.environ:
        return None
    try:
        if spark.conf.get("spark.sec_edgar.autosize_shuffle", "true") == "false":
            return None
    except Exception:
        return None
    state = getattr(spark, _STATE_ATTR, None)
    if state is None:
        state = {
            "floor": int(spark.conf.get("spark.sql.shuffle.partitions")),
            "sugg": {},
        }
        setattr(spark, _STATE_ATTR, state)
    return state


def _apply(spark: SparkSession, state: dict, sf_dir: str) -> int:
    eff = max(state["floor"], state["sugg"].get(sf_dir, 0))
    if int(spark.conf.get("spark.sql.shuffle.partitions")) != eff:
        spark.conf.set("spark.sql.shuffle.partitions", str(eff))
    return eff
