"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For each left row, attach the single right row with the greatest
``right_ts <= left_ts`` (backward; ``>=``/least for forward) sharing the
equi-key.  The classic formulations are a range join (quadratic blowup
per key) or a per-row correlated subquery (not distributed); this one is
the scale-safe union+window form:

1. tag both sides and align them into one frame,
2. ONE shuffle: window partitioned by the key, ordered by
   ``(ts, side)`` — right rows sort before left rows at equal
   timestamps for non-strict semantics, after them for strict,
3. ``last(right_payload, ignorenulls=True)`` over
   ``rows unbounded preceding .. current row`` carries the latest
   right payload onto every left row,
4. keep left rows, unpack the payload struct.

Cost is one shuffle + sort of |L|+|R| rows regardless of temporal
density — no candidate blowup, no driver loop.  Skewed keys can reuse
``salted_aggregate``-style pre-splitting upstream; the window itself is
per-key sequential (inherent to as-of semantics).

Reference parity note: the reference engine has no as-of join; this is
part of the training-data-pipeline extension family (point-in-time
feature attachment, e.g. "state of the filer as of the event").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
    suffix: str = "_right",
) -> DataFrame:
    """Point-in-time join; returns every left row (left-outer semantics)
    with the matched right columns renamed ``<col><suffix>`` (right_ts
    included), NULL when no right row qualifies.

    direction="backward": greatest right_ts <= left_ts (< if strict).
    direction="forward":  least right_ts >= left_ts (> if strict).
    Ties among right rows on (key, right_ts) resolve to the row ordered
    last by the remaining payload columns (deterministic).
    """
    if isinstance(on, str):
        on = [on]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]
    payload = [c for c in right_cols if c != right_ts] + [right_ts]

    # side ordering at equal ts: non-strict → right first (a right row AT
    # left_ts is eligible); strict → right last (not yet visible).
    right_side = 0 if not strict else 2
    l2 = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            "struct<" + ", ".join(f"{c}: {right.schema[c].dataType.simpleString()}" for c in payload) + ">"
        ).alias("_rrow"),
    )
    r2 = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        F.lit(None).cast(l2.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*[F.col(c) for c in payload]).alias("_rrow"),
    )
    u = l2.unionByName(r2)

    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("_side").asc(), F.col("_rrow").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    left_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    match_cols = [F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in payload]
    return out.select(*left_cols, *match_cols)
