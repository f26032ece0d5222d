"""Z-order (Morton) clustering key — multi-dimensional data skipping.

The 100 TB problem: parquet row-group min/max stats prune a scan only
along the sort key.  Sorting by (date) makes date filters cheap but
customer filters scan everything; sorting by Morton-interleaved
(date, customer) bits makes BOTH filters prune, because z-ordering
bounds every file's bounding box in all interleaved dimensions at
once.  This is the technique behind Delta/Iceberg `ZORDER BY` /
`sort_order(z)` — here as a plain Column expression, so
``df.repartitionByRange(N, z).sortWithinPartitions(z).write.parquet``
gets the same file-skipping layout on stock Spark parquet.

The key is a static unrolled expression (2*bits shift/mask/add terms,
whole-stage-codegen friendly, no UDF) and pure integer arithmetic, so
it is bit-identical across engines — the oracle-checked query in
queries/scalepats.py replays it in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one BIGINT: x supplies even bit positions, y odd.
    Callers clamp/scale their dimensions into [0, 2**bits) first
    (e.g. days-since-epoch, id % 2**bits, or a min/max rescale)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xb = x.cast("bigint")
    yb = y.cast("bigint")
    k: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        k = (
            k
            + F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return k


def morton_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The exact same interleave as :func:`morton_key`, as engine-
    portable SQL (power-of-two multiply instead of shifts) — used by
    the oracle so both engines compute identical keys."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def morton_decode_py(z: int, bits: int = 16) -> tuple[int, int]:
    """Pure-Python inverse of the interleave — (x, y) from a Morton
    key.  Used by property tests to prove the key is a bijection on
    [0, 2**bits)² (a non-injective key would let unrelated rows
    collide into one z-range and silently break the locality/skipping
    guarantee)."""
    x = y = 0
    for i in range(bits):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


def morton_encode_py(x: int, y: int, bits: int = 16) -> int:
    """Pure-Python twin of :func:`morton_key` (same bit layout), for
    tests and driver-side tooling."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z
