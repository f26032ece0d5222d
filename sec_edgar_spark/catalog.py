"""Loader for the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.

At cluster scale these would be partitioned/bucketed external tables; the
loader keeps a per-(session, dir) memo so repeated query invocations
don't re-read footers, and callers get plain DataFrames so every plan
stays declarative (filter/column pushdown reaches the parquet scan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_MEMO_ATTR = "_sec_edgar_spark_catalog_memo"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Data-scaled shuffle sizing (operators/partitions.py): every scan
    # feeds the dataset's input-bytes statistics into
    # spark.sql.shuffle.partitions so per-task shuffle input stays
    # bounded as data grows — the engine-behavior fix for the
    # BENCH_SF100 spill wall.  Runs on every call (memo hits included):
    # the conf must follow the dataset currently being queried.
    from .operators.partitions import autosize_shuffle

    autosize_shuffle(spark, sf_dir, table_path=f"{sf_dir}/{name}.parquet")
    memo = getattr(spark, _MEMO_ATTR, None)
    if memo is None:
        memo = {}
        setattr(spark, _MEMO_ATTR, memo)
    par = _parallelize_tables(spark)
    key = (sf_dir, name, name in par)
    if key not in memo:
        path = f"{sf_dir}/{name}.parquet"
        if name == "events":
            # The driver's events.parquet stores TIMESTAMP(NANOS), which
            # the vectorized reader rejects; read nanos as long and
            # truncate to micros (lossless here — the data is
            # micro-precise, and the DuckDB oracle coerces to micros the
            # same way).  Re-written mirrors may already be micros —
            # only convert when the column actually came in as long.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            from pyspark.sql import functions as F
            from pyspark.sql.types import LongType

            df = spark.read.parquet(path)
            if isinstance(df.schema["ts"].dataType, LongType):
                df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        else:
            df = spark.read.parquet(path)
        if name in par:
            # The driver's testdata is ONE row group per table, so every
            # scan is a single task and CPU-heavy map stages (shingle
            # assembly, hashing, vector math) run on one core until the
            # first shuffle.  A real lakehouse layout has many row
            # groups/files and never hits this; under the flag (set by
            # bench.py for the per-row-CPU-heavy tables, never by the
            # correctness gate) a cheap early round-robin spreads the
            # scan across the executor before the expensive per-row
            # work.  Filters still push into the scan — Catalyst moves
            # deterministic predicates through Repartition.  Cheap
            # aggregate-only queries are NOT flagged: for them the
            # extra shuffle costs more than the single-task scan.
            #
            # r14 (VERDICT r13 #1): the spread count is bounded by the
            # TABLE'S OWN ROW COUNT (parquet footer metadata — no job),
            # not raw defaultParallelism: per-task work here is
            # per-row CPU, so a 2 000-row table fanned 32 ways makes
            # 32 tasks of ~60 rows whose scheduling overhead exceeds
            # the work — the r13 driver measured the battery's 32-core
            # leg losing to its own 8-core leg on exactly these
            # shapes.  ≥256 rows per spread task keeps small tables on
            # few tasks at any core count while big tables still use
            # the whole executor (50 k rows → the full parallelism).
            df = df.repartition(_spread_parts(spark, path))
        memo[key] = df
    return memo[key]


SPREAD_ROWS_PER_TASK = 256


def _spread_parts(spark: SparkSession, path: str) -> int:
    """Scan-spread partition count: ceil(rows / SPREAD_ROWS_PER_TASK)
    clamped to [1, defaultParallelism].  Row count comes from the
    parquet footer (a metadata read, no Spark job); unreadable footers
    fall back to the historical defaultParallelism."""
    par = spark.sparkContext.defaultParallelism
    try:
        import pyarrow.parquet as _pq

        rows = _pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return par
    return max(1, min(par, -(-rows // SPREAD_ROWS_PER_TASK)))


def _parallelize_tables(spark: SparkSession) -> frozenset[str]:
    """Tables to round-robin after the scan: comma-separated names, or
    'true'/'all' for every table, in spark.sec_edgar.scan_parallelize."""
    raw = spark.conf.get("spark.sec_edgar.scan_parallelize", "")
    if raw in ("", "false"):
        return frozenset()
    if raw in ("true", "all"):
        return frozenset(TABLES)
    return frozenset(t.strip() for t in raw.split(",") if t.strip())


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql callers)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
