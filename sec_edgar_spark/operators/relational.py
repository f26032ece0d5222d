"""Relational helper operators (library surface).

The reference's order-sensitive operators (SURVEY §2.4 A3, §2.6 L1) as
reusable window compositions with explicit total orders — determinism
under partitioned scans is the contract (SURVEY §7 risk 2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame, partition_by: list[str], order_by: list[Column], k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """L1 per-group top-k (company.py:198-213): row_number ≤ k.

    Spark ≥3.5 plans WindowGroupLimit — each partition keeps only k rows
    before the window sort completes, so this is safe on skewed groups.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def running_count(
    df: DataFrame,
    order_by: list[Column],
    partition_by: list[str] | None = None,
    out_col: str = "num_previously_valid",
) -> DataFrame:
    """A3 running valid-entry counter (core/_index.py:160-173): number of
    preceding rows in the pinned order.  Partition by the source file at
    scale; global order only for single-file semantics."""
    w = (
        Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    ).orderBy(*order_by)
    return df.withColumn(out_col, (F.row_number().over(w) - 1).cast("bigint"))


def grouped_collect(
    df: DataFrame, key: str, value: Column, out_col: str = "values"
) -> DataFrame:
    """A1 group-by-key list aggregation with deterministic (sorted)
    order — the dict[cik → list] shape of _index.py:174-178."""
    return df.groupBy(key).agg(F.sort_array(F.collect_list(value)).alias(out_col))
