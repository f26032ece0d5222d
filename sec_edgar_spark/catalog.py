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
    memo = getattr(spark, _MEMO_ATTR, None)
    if memo is None:
        memo = {}
        setattr(spark, _MEMO_ATTR, memo)
    key = (sf_dir, name)
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
        memo[key] = df
    return memo[key]


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql callers)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
