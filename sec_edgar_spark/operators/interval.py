"""Banded range (interval) join — bounded-distance pairs without a
quadratic theta-join.

``range_join`` finds every (left, right) pair sharing an equi-key whose
timestamps lie within ``tolerance`` of each other.  Naively that is a
theta-join (|L|·|R| per key); the scale-safe formulation buckets both
sides into tolerance-width bins and equi-joins on (key, bin), probing
each left row against its own bin and the two neighbours — any pair
within tolerance is guaranteed to land in adjacent bins, and the exact
predicate then refines the candidates.  Cost: 3 bin-keys per left row
(explode), one shuffle-on-(key, bin) join, colocated refinement — the
same never-all-pairs shape as the LSH/grid joins in operators/dedup.py
and operators/similarity.py, applied to 1-D time.

This generalizes the reference's date-window filtering (F7/F8) from
point-lookup to pairwise association, and is the batch twin of a
stream-stream interval join (streaming/join_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import epoch_s


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    tolerance_s: int,
    suffix: str = "_right",
) -> DataFrame:
    """Inner join of all pairs with ``|left_ts - right_ts| <= tolerance_s``
    sharing the equi-key; right columns come back ``<col><suffix>``.

    Bin width == tolerance, so a matching right row is always in the
    left row's bin or an adjacent one: probing bins {b-1, b, b+1} has
    perfect recall, and the exact refinement keeps precision.
    """
    if isinstance(on, str):
        on = [on]
    tol = F.lit(int(tolerance_s)).cast("long")
    # Exact integer bin start (x - x % tol): long arithmetic only, so
    # boundary timestamps never mis-bin the way double division can.
    l_sec = epoch_s(left_ts)
    r_sec = epoch_s(right_ts)
    l_bin = l_sec - (l_sec % tol)
    r_bin = r_sec - (r_sec % tol)

    probe = F.explode(F.array(l_bin - tol, l_bin, l_bin + tol)).alias("_bin")
    l2 = left.select("*", probe)
    r2 = right.select(
        *[F.col(c).alias(c) for c in on],
        r_bin.alias("_bin"),
        F.struct(*[F.col(c) for c in right.columns if c not in on]).alias("_r"),
    )
    joined = l2.join(r2, on=[*on, "_bin"])
    refined = joined.filter(
        F.abs(epoch_s(left_ts) - epoch_s(F.col(f"_r.{right_ts}")))
        <= tol
    )
    right_payload = [c for c in right.columns if c not in on]
    return refined.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_r.{c}").alias(f"{c}{suffix}") for c in right_payload],
    )
