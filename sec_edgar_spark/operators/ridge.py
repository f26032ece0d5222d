"""Closed-form ridge regression, entirely inside the Spark plan.

The classic scalable-ML decomposition: for a linear model the ENTIRE
training reduces to one pass of sufficient statistics — the Gram
matrix X'X and moment vector X'y — which are algebraic aggregates
(map-side combinable, one shuffle of a constant-size row) regardless
of corpus size.  With a small fixed feature count the normal-equation
solve (X'X + λI) w = X'y is itself expressible as scalar arithmetic
(Cramer's rule), so training AND inference stay declarative: no
driver-side .collect(), no numpy, no iterative optimizer — the
trained weights are a broadcast 1-row frame cross-joined back onto
the data, exactly the repo's kmeans-centroid shape.

Determinism contract (the oracle story): features and targets are
exact integers, so every Gram entry is an exact BIGINT; determinants
are evaluated in 38-digit decimal (Spark decimal(38,0) ≡ DuckDB
HUGEINT promotion) with a FIXED expression tree, so both engines
produce identical integers; each weight is ONE double division of two
exact integers, and predictions are a fixed left-associated double
polynomial — bit-identical across engines end to end, including the
solve.  (At 3 features Cramer is exact and tiny; for hundreds of
features you'd collect the O(k²) Gram — still corpus-independent —
and solve with LAPACK, losing only the oracle's exactness, not
scalability.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_D = "decimal(38,0)"


def _det3(a):
    """Exact 3x3 determinant of [[a[0],a[1],a[2]],[a[3],...],...] —
    fixed expression tree (cofactor expansion along the first row)."""
    return (
        a[0] * (a[4] * a[8] - a[5] * a[7])
        - a[1] * (a[3] * a[8] - a[5] * a[6])
        + a[2] * (a[3] * a[7] - a[4] * a[6])
    )


STAT_COLS = (
    "n", "sx1", "sx2", "sx1x1", "sx1x2", "sx2x2", "sy", "sx1y", "sx2y"
)


def ridge3_stats(
    df: DataFrame, x1: Column, x2: Column, y: Column
) -> DataFrame:
    """One-row frame of the model's sufficient statistics — exact
    BIGINT sums, map-side combinable, and MERGEABLE: statistics of a
    union are the columnwise sums of per-part statistics, which is
    what makes the model incrementally/streaming-trainable
    (streaming/ridge_stream.py) and embarrassingly distributable."""
    return df.select(
        x1.cast("bigint").alias("x1"),
        x2.cast("bigint").alias("x2"),
        y.cast("bigint").alias("y"),
    ).agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx1x2"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx2x2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
    )


def ridge3_solve(stats: DataFrame, lam: int = 1) -> DataFrame:
    """Cramer-solve a 1-row sufficient-statistics frame into the
    ``(w0, w1, w2, det)`` weight row (exact decimal(38) determinants,
    one double division per weight).

    MAGNITUDE BOUND: the determinant multiplies three decimal(38,0)
    Gram sums, so its terms grow ~(max|x|² · n)³.  With |x| ≤ ~300
    (the capped gate features) that overflows decimal(38) around
    n ≈ 1e10 rows — ANSI mode errors there, and non-ANSI yields NULL.
    The corpus-size-independence claim holds only below that bound;
    past it, center/scale the features or shard the fit.  A NULL det
    is therefore FAILED LOUDLY in-plan (raise_error), never emitted
    as silent NULL weights."""
    s = stats
    L = F.lit(lam).cast(_D)
    c = lambda name: F.col(name).cast(_D)
    # A = X'X + λI (row-major), b = X'y — note the intercept column of
    # ones contributes n, sx1, sx2.
    A = [
        c("n") + L, c("sx1"), c("sx2"),
        c("sx1"), c("sx1x1") + L, c("sx1x2"),
        c("sx2"), c("sx1x2"), c("sx2x2") + L,
    ]
    b = [c("sy"), c("sx1y"), c("sx2y")]

    def repl(col_idx):
        return [
            b[r] if i == col_idx else A[r * 3 + i]
            for r in range(3)
            for i in range(3)
        ]

    # Overflow guard: in non-ANSI mode a decimal(38) overflow surfaces
    # as NULL — turn that into a hard error instead of NULL weights.
    # The three NUMERATOR determinants use the same decimal(38)
    # arithmetic at comparable (X'y-scaled) magnitudes and can overflow
    # independently of the denominator, so all four are guarded.
    def _guarded(expr, which):
        return F.when(
            expr.isNull(),
            F.raise_error(
                F.lit(
                    f"ridge3_solve: decimal(38) {which} determinant "
                    "overflow — Gram sums too large (see magnitude "
                    "bound in docstring); center/scale features or "
                    "shard the fit"
                )
            ).cast(_D),
        ).otherwise(expr)

    det = _guarded(_det3(A), "denominator")
    num = [_guarded(_det3(repl(i)), f"numerator[{i}]") for i in range(3)]
    return s.select(
        (num[0].cast("double") / det.cast("double")).alias("w0"),
        (num[1].cast("double") / det.cast("double")).alias("w1"),
        (num[2].cast("double") / det.cast("double")).alias("w2"),
        det.cast("double").alias("det"),
    )


def ridge3_fit(
    df: DataFrame, x1: Column, x2: Column, y: Column, lam: int = 1
) -> DataFrame:
    """One-row DataFrame of the closed-form ridge solution
    ``(w0, w1, w2, det)`` for ``y ~ w0 + w1*x1 + w2*x2`` with L2
    penalty ``lam`` on every coefficient.  ``x1``/``x2``/``y`` must be
    integer-valued columns (the exactness contract)."""
    return ridge3_solve(ridge3_stats(df, x1, x2, y), lam)


def ridge3_predict(
    df: DataFrame, weights: DataFrame, x1: Column, x2: Column
) -> DataFrame:
    """``df`` plus ``y_hat = w0 + w1*x1 + w2*x2`` (fixed
    left-associated double arithmetic), with the 1-row trained
    ``weights`` broadcast."""
    return df.crossJoin(broadcast(weights)).withColumn(
        "y_hat",
        F.col("w0")
        + F.col("w1") * x1.cast("double")
        + F.col("w2") * x2.cast("double"),
    )
