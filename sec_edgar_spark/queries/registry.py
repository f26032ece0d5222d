"""Registry mapping query name → (spark callable, duckdb oracle SQL).

Contract (driver): each callable takes ``(spark, sf_dir)`` and returns a
DataFrame; the oracle SQL runs in DuckDB over the same parquet tables
registered as views.  Column names must match exactly (the comparator
sorts columns by name before hashing values), so every computed column
is aliased identically on both sides.

Determinism rules used throughout the battery (so value-hashes match):
- money/measure aggregation happens in DECIMAL (exact), converted to
  DOUBLE only at the end; divisions happen in DOUBLE on already-exact
  operands → bit-identical IEEE results in both engines;
- every hash is md5-based (portable), never engine-native xxhash;
- every LIMIT/top-k has a total-order tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator registering a (spark, sf_dir) -> DataFrame callable and
    its DuckDB oracle SQL (None → driver does a rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco
