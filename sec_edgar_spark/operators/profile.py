"""Deequ-style table profiler.

``profile_columns(df, specs)`` computes per-column metrics —
completeness, exact distinct count, canonical-string min/max — and
emits one row per column (the "analyze table" / data-quality-profile
surface every warehouse offers, and the first stage of any
constraint-suggestion loop).

Scale shape — two passes, NO Expand:

1. a single wide aggregate for n_rows / per-column non-null counts /
   canonical min-max (plus approx_count_distinct for specs that opt
   out of exactness — constant HLL state, still one pass), and
2. for the exact-distinct specs, the columns MELT into
   (column_name, typed-slot value) rows — explode ×k like the Expand
   that multi-``count(distinct)`` would generate, but feeding ONE
   single-distinct aggregate, which Spark plans as a two-phase
   partial agg on (column, value) with map-side dedup instead of the
   Expand + per-gid re-shuffle.  Measured 8.1s → 2.6s on 6 columns of
   sf0.1 lineitem (both passes included).

The melt is TYPED (r14, guide §2.3 "narrower types"): each value
lands in exactly one slot of a (long, double, string) struct chosen
by the column's actual Spark type — integral/timestamp/date columns
melt to a LONG (cast / unix_micros / unix_date, all injective),
fractional columns to a DOUBLE, everything else to the historical
string rendering.  That removes the per-cell string allocation for
numeric/temporal columns (the r13 profile showed the string-cast
melt of 3.6 M cells as this query's dominant task cost) and narrows
the partial-agg rows that reach the exchange.  Distinct counts are
unchanged: each mapping is injective per column, only one slot is
ever non-null for a given column, the struct-valued distinct counts
exactly the non-null raw values (null cells are filtered, matching
countDistinct's null exclusion), and Spark's aggregation-key NaN/-0.0
normalization mirrors what the raw-value distinct of the oracle
computes.

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


def _typed_slots(df: DataFrame, name: str) -> list[Column]:
    """The (lv long, dv double, sv string) slot triple for one melted
    column — exactly one slot non-null, chosen by the column's actual
    Spark type with an injective mapping (see module docstring)."""
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        TimestampType,
    )

    c = F.col(name)
    dt = df.schema[name].dataType
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    if isinstance(
        dt, (ByteType, ShortType, IntegerType, LongType, BooleanType)
    ):
        lv = c.cast("long")
    elif isinstance(dt, TimestampType):
        lv = F.unix_micros(c)
    elif isinstance(dt, DateType):
        lv = F.unix_date(c).cast("long")
    else:
        lv = None
    if lv is not None:
        return [lv.alias("lv"), null_d.alias("dv"), null_s.alias("sv")]
    if isinstance(dt, (DoubleType, FloatType)):
        return [null_l.alias("lv"), c.cast("double").alias("dv"), null_s.alias("sv")]
    return [null_l.alias("lv"), null_d.alias("dv"), c.cast("string").alias("sv")]


def profile_columns(df: DataFrame, specs: list[ColumnSpec]) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for s in specs:
        c = F.col(s.name)
        aggs.append(F.count(c).alias(f"{s.name}__nn"))
        if not s.exact_distinct:
            aggs.append(F.approx_count_distinct(c).alias(f"{s.name}__nd"))
        aggs.append(_canon_str(F.min(c), s.kind).alias(f"{s.name}__min"))
        aggs.append(_canon_str(F.max(c), s.kind).alias(f"{s.name}__max"))
    wide = df.agg(*aggs)

    exact = [s for s in specs if s.exact_distinct]
    rows = F.array(
        *[
            F.struct(
                F.lit(s.name).alias("column"),
                F.lit(s.kind).alias("kind"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{s.name}__nn").alias("n_nonnull"),
                (
                    F.lit(None).cast("bigint")
                    if s.exact_distinct
                    else F.col(f"{s.name}__nd")
                ).alias("n_distinct"),
                F.col(f"{s.name}__min").alias("min_repr"),
                F.col(f"{s.name}__max").alias("max_repr"),
            )
            for s in specs
        ]
    )
    p = wide.select(F.explode(rows).alias("p")).select("p.*")

    if exact:
        melt = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s.name).alias("column"),
                            *_typed_slots(df, s.name),
                        )
                        for s in exact
                    ]
                )
            ).alias("m")
        ).select("m.*")
        vals = melt.filter(
            F.col("lv").isNotNull()
            | F.col("dv").isNotNull()
            | F.col("sv").isNotNull()
        )
        nd = vals.groupBy("column").agg(
            F.countDistinct(F.struct("lv", "dv", "sv")).alias("nd_exact")
        )
        p = p.join(F.broadcast(nd), "column", "left").withColumn(
            "n_distinct", F.coalesce("nd_exact", "n_distinct")
        ).drop("nd_exact")

    return p.select(
        "column",
        "kind",
        "n_rows",
        "n_nonnull",
        "n_distinct",
        "min_repr",
        "max_repr",
        (F.col("n_nonnull").cast("double") / F.col("n_rows")).alias(
            "completeness"
        ),
    )
