"""Deequ-style one-pass table profiler.

``profile_columns(df, specs)`` computes per-column metrics —
completeness, exact distinct count, canonical-string min/max — in a
SINGLE aggregate over the table and emits one row per column (the
"analyze table" / data-quality-profile surface every warehouse offers,
and the first stage of any constraint-suggestion loop).

Scale shape: one scan → one HashAggregate.  The exact multi-column
``count(distinct)`` compiles to Spark's Expand operator (one duplicate
of the stream per distinct-agg), so the input is multiplied by
``len(specs)`` BEFORE the map-side partial agg — callers profile a
bounded column list, not ``df.columns`` wholesale, at 100 TB (or swap
``exact_distinct=False`` per spec to get approx_count_distinct with
constant-size HLL state and no Expand).  The final melt from one wide
row to per-column rows touches a 1-row frame — free.

Determinism contract (driver-hash safe): min/max surface as CANONICAL
STRINGS (numerics through a fixed-scale decimal, timestamps through
the engine-shared 'yyyy-MM-dd HH:mm:ss' rendering), completeness is
one double division of two exact longs, and there are no float
aggregations at all.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    kind: str  # 'int' | 'num' | 'str' | 'ts'
    exact_distinct: bool = True


def _canon_str(c: Column, kind: str) -> Column:
    if kind == "num":
        return c.cast("decimal(18,2)").cast("string")
    if kind == "ts":
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    return c.cast("string")


def profile_columns(df: DataFrame, specs: list[ColumnSpec]) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for s in specs:
        c = F.col(s.name)
        aggs.append(F.count(c).alias(f"{s.name}__nn"))
        d = (
            F.countDistinct(c)
            if s.exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs.append(d.alias(f"{s.name}__nd"))
        aggs.append(_canon_str(F.min(c), s.kind).alias(f"{s.name}__min"))
        aggs.append(_canon_str(F.max(c), s.kind).alias(f"{s.name}__max"))
    wide = df.agg(*aggs)

    rows = F.array(
        *[
            F.struct(
                F.lit(s.name).alias("column"),
                F.lit(s.kind).alias("kind"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{s.name}__nn").alias("n_nonnull"),
                F.col(f"{s.name}__nd").alias("n_distinct"),
                F.col(f"{s.name}__min").alias("min_repr"),
                F.col(f"{s.name}__max").alias("max_repr"),
            )
            for s in specs
        ]
    )
    p = wide.select(F.explode(rows).alias("p")).select("p.*")
    return p.withColumn(
        "completeness",
        F.col("n_nonnull").cast("double") / F.col("n_rows"),
    )
