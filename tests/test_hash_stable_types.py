"""Schema-level lint for the driver-hash contract (README "Driver-hash
stability contract").

The external gate hashes ``str()`` renderings after pandas conversion,
where Spark and DuckDB render the SAME value differently for some
types — Spark gives scale-padded ``Decimal('4719.0300')`` while DuckDB
DECIMAL arrives as float64 ``4719.03`` (CORRECTNESS_r04's only two
reds), and float32 round-trips through pandas with different repr
digits than float64.  So gate-facing outputs must never expose
DecimalType or FloatType — decimals stay internal, doubles/bigints/
strings at the boundary.

This lint walks the OUTPUT schema (incl. nested arrays/maps/structs)
of every registered oracle-checked query without executing it, so a
future query that leaks a decimal fails the suite even if its values
happen to hash-match on today's data.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} not present"
)


def _fragile(dt, path):
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return [(path, f"decimal({dt.precision},{dt.scale})")]
    if isinstance(dt, T.FloatType):
        return [(path, "float32")]
    if isinstance(dt, T.StructType):
        return [
            p
            for f in dt.fields
            for p in _fragile(f.dataType, f"{path}.{f.name}")
        ]
    if isinstance(dt, T.ArrayType):
        return _fragile(dt.elementType, path + "[]")
    if isinstance(dt, T.MapType):
        return _fragile(dt.keyType, path + "{key}") + _fragile(
            dt.valueType, path + "{}"
        )
    return []


def _registry():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


@pytest.mark.slow
def test_no_hash_fragile_gate_outputs(spark):
    # slow tier (r14): builds every registry plan (~6 min — the probe
    # jobs some constructions run dominate); the same registry-wide
    # build runs in test_plan_audit's slow tier and the driver's own
    # gate exercises the actual output hashing every round.
    queries, oracles = _registry()
    offenders = {}
    for name, fn in sorted(queries.items()):
        if name not in oracles:
            continue  # rows-only queries aren't value-hashed
        df = fn(spark, SF_DIR)
        probs = [
            p for f in df.schema.fields for p in _fragile(f.dataType, f.name)
        ]
        if probs:
            offenders[name] = probs
    assert not offenders, (
        "gate outputs expose hash-fragile types (cast to double/bigint/"
        f"string at the boundary, keep decimals internal): {offenders}"
    )
