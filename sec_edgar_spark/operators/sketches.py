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
