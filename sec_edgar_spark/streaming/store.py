"""Tiny shared helper for the foreachBatch parquet stores.

One place for the "read the store or start empty" probe so the three
sinks (SCD2 split layout, LSH band index, ridge stats log) can't
drift: any change to store detection (nested part dirs, remote
filesystems, _SUCCESS markers) lands once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """The parquet directory at ``path`` as a DataFrame with ``schema``,
    or an empty frame of that schema when nothing has been written yet."""
    if os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def store_exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )
