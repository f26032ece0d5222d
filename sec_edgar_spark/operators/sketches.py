"""Mergeable frequency sketches (count-min) — bounded-size frequency
estimation for unbounded key cardinality.

At 100 TB the exact token-frequency table is itself huge; a count-min
sketch is the standard bounded-memory answer: D hash rows × W buckets
of counts, update = D increments, estimate = min over the D bucket
counts (always an over-estimate, biased by collisions).  The groupBy
formulation below is mergeable by construction — partial (row, bucket)
counts combine map-side exactly like any hash aggregate, so the same
code is the single-pass distributed build.

All hashes are md5-derived (functions/text.md5_hash64) — deterministic
and engine-portable, so a DuckDB oracle reproduces the sketch (and its
collisions) bit-for-bit.  Not a probabilistic test: given the fixed
hash family the whole structure is a pure function of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def _bucket(col, j: int, width: int):
    """Row-j bucket of a value: md5(j || ':' || value) % width."""
    return T.md5_hash64(F.concat(F.lit(f"{j}:"), col)) % width


def countmin_build(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(row, bucket, cnt) sketch table from one item occurrence per
    input row.  D×W rows max — broadcastable at any corpus size."""
    rows = items.select(
        F.posexplode(
            F.array(*[_bucket(F.col(item_col), j, width) for j in range(depth)])
        ).alias("row", "bucket")
    )
    return rows.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Attach ``cms_estimate`` (min over the D bucket counts) to every
    row of ``terms``.  The sketch broadcasts; per term the D probes are
    one equi-join + a min aggregate."""
    probes = terms.select(
        F.col(term_col),
        F.posexplode(
            F.array(*[_bucket(F.col(term_col), j, width) for j in range(depth)])
        ).alias("row", "bucket"),
    )
    hit = probes.join(F.broadcast(sketch), ["row", "bucket"])
    est = hit.groupBy(term_col).agg(F.min("cnt").alias("cms_estimate"))
    return terms.join(F.broadcast(est), term_col, "left")


# ---------------------------------------------------------------- HLL

HLL_M = 16  # registers (b = 4 bucket bits)
HLL_W = 56  # rho window: 60-bit hash minus 4 bucket bits
HLL_ALPHA_16 = 0.673  # standard bias constant for m=16
# numerator of the raw estimator, precomputed once so BOTH engines
# evaluate exactly one double division: alpha * m^2 * 2^(W+1)
HLL_NUMERATOR = HLL_ALPHA_16 * (HLL_M**2) * float(2 ** (HLL_W + 1))
HLL_EMPTY_WEIGHT = 2 ** (HLL_W + 1)  # empty register contributes 2^0=1 (scaled)


def hll_register_weights(
    items: DataFrame, group_cols: list[str], item_col
) -> DataFrame:
    """(group..., bucket, w) — per-register scaled indicator weights.

    Classic HLL: bucket = low 4 bits of the 60-bit md5 hash; rho = 1 +
    leading zeros of the remaining 56 bits; register j keeps max(rho).
    Everything here stays INTEGER-exact: instead of summing 2^-rho
    doubles (whose addition order would round), each register carries
    w_j = 2^(W+1-max_rho_j) as a long (min over elements, since the
    weight is monotone-decreasing in rho), and the final sum of 16
    longs is exact — so the one double division at the end is the only
    float op and the estimate is bit-identical on any engine and any
    partitioning/aggregation order.  rho derives from bit length
    (string length of bin(rest)) — integer-exact, no log2 doubles.
    """
    h = T.md5_hash64(item_col)
    rest = F.shiftright(h, 4)
    staged = items.select(
        *group_cols,
        F.pmod(h, F.lit(HLL_M)).alias("bucket"),
        F.when(rest == 0, F.lit(0))
        .otherwise(F.length(F.bin(rest)))
        .cast("int")
        .alias("_bits"),
    )
    # shiftleft's Python wrapper only takes literal bit counts; the SQL
    # expression accepts a column.
    rows = staged.select(
        *group_cols,
        "bucket",
        F.expr("shiftleft(CAST(1 AS BIGINT), _bits)").alias("w"),
    )
    return rows.groupBy(*group_cols, "bucket").agg(F.min("w").alias("w"))


def hll_estimate(weights: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., hll_estimate) from register weights; absent registers
    contribute the empty weight (2^(W+1))."""
    buckets = weights.sparkSession.range(HLL_M).select(
        F.col("id").cast("bigint").alias("bucket")
    )
    # Fill absent registers by UNIONING one empty-weight filler row per
    # (group, bucket) and re-taking the min — real registers always win
    # (w <= empty weight), and a union avoids joining a frame back onto
    # its own derivative (self-join reference conflicts).
    filler = (
        weights.select(*group_cols)
        .distinct()
        .crossJoin(F.broadcast(buckets))
        .select(
            *group_cols,
            "bucket",
            F.lit(HLL_EMPTY_WEIGHT).cast("bigint").alias("w"),
        )
    )
    full = weights.select(*group_cols, "bucket", "w").unionByName(filler)
    regs = full.groupBy(*group_cols, "bucket").agg(F.min("w").alias("w"))
    return regs.groupBy(*group_cols).agg(
        (F.lit(HLL_NUMERATOR) / F.sum("w")).alias("hll_estimate")
    )


def countmin_self_join_size(sketch: DataFrame) -> DataFrame:
    """Self-join size estimate from a count-min sketch: per hash row
    the sum of squared bucket counts over-estimates F₂ = Σ_v f(v)²
    (the exact self-join cardinality) by the collision cross-terms;
    the min over the D rows is the classic CM/AMS second-moment
    estimate — the quantity a planner uses to size a self-join or
    detect key skew WITHOUT an exact frequency table.

    One row out: ``cms_estimate``.  Sums run in DECIMAL(38,0): bucket
    counts near 10^9 square to 10^18 per cell, so int64 would overflow
    at warehouse scale while 38 digits holds to ~10^19 rows per cell.
    """
    sq = F.col("cnt").cast("decimal(38,0)")
    per_row = sketch.groupBy("row").agg(F.sum(sq * sq).alias("s"))
    return per_row.agg(F.min("s").alias("cms_estimate"))
