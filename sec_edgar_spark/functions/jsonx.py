"""Strict-JSON validity gate for semi-structured payload queries.

Why this exists (ADVICE r11, pinned by the poison corpus): the two
engines disagree on PARTIALLY-valid JSON.  Spark's entire JSON surface
— ``get_json_object``, ``from_json`` (even FAILFAST treats it as
well-formed), and the Spark 4 variant path ``try_parse_json`` — parses
the FIRST JSON document and ignores trailing bytes, so
``'{"k": 99} trash'`` extracts ``k = 99``.  DuckDB's ``json_valid`` /
``json_extract`` are RFC-strict and reject the same payload.  Neither
semantics can be expressed in the other engine's SQL: leniency has no
DuckDB formulation (no "parse a prefix" function), strictness has no
Spark JVM formulation (every builtin is prefix-lenient — probed
empirically, see tests/test_json_strict.py).

So the engine CONTRACT is strict (matching ``json_valid``: a payload
with trailing garbage is invalid and extracts NULL), and the Spark
side enforces it with this Arrow-batched scalar ``pandas_udf`` — a
deliberate, documented exception to the JVM-only-hot-path policy
(PY_UDF_WHITELIST in tools/plan_audit.py), in the same class as the
uudecode escape hatch: payload VALIDITY is parsing-layer logic with no
JVM expression, not analytics math.  At 100 TB the production shape is
to run this gate ONCE at intake (persist a ``props_valid`` bit or NULL
out bad payloads in the bronze->silver hop) so analytic queries stay
JVM-only; the per-query form here exists because the oracle reads the
raw table.

Semantics (CPython ``json.loads`` default = RFC 8259 + the NaN/
Infinity constant extension), probed against DuckDB ``json_valid``
over an edge matrix in tests/test_json_strict.py:
- NULL           -> false (callers NULL the extraction either way)
- any top-level value (object/array/string/number/true/false/null) ok
- surrounding whitespace ok
- trailing bytes after the first value -> INVALID (both agree)
- NaN/Infinity/-Infinity constants -> VALID (both engines accept;
  the downstream typed extraction must therefore try_cast — a strict
  BIGINT cast of the string 'NaN' crashes BOTH engines under ANSI)
- leading-zero numbers, unescaped control chars -> INVALID (both)
- KNOWN residual divergence, pinned in tests/test_json_strict.py:
  trailing commas ('[1,2,]', '{"k":1,}').  yyjson-in-DuckDB accepts
  them (a relaxed non-RFC flag), CPython rejects; neither behavior is
  reachable from the other side without a hand-written JSON scanner,
  so the contract keeps the RFC answer and the poison corpus
  deliberately contains no trailing-comma payload.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


def _valid_one(s) -> bool:
    if s is None or (isinstance(s, float) and pd.isna(s)):
        return False
    try:
        json.loads(s)
        return True
    except (ValueError, TypeError, RecursionError):
        return False


# Explicit DataType, NOT the DDL string "boolean": this module is
# re-imported inside executor Python workers when the UDF unpickles,
# and parsing a DDL string there needs an active SparkSession
# (SESSION_OR_CONTEXT_NOT_EXISTS) — a plain DataType does not.
@pandas_udf(BooleanType())
def json_strict_valid(props: pd.Series) -> pd.Series:
    """True iff the string is ONE complete RFC-8259 JSON value
    (DuckDB ``json_valid`` parity).  Arrow scalar UDF: the batch
    transfer is Arrow-amortized, but ``Series.map`` over a Python
    callable is still a per-element CPython call — ``json.loads`` has
    no vectorized form, so the per-row parse cost is inherent to the
    contract, not hidden by batching (ADVICE r12).  The 100 TB shape
    stays the documented bronze→silver intake gate: pay this parse
    once at ingest, persist a validity bit, keep analytics JVM-only."""
    return props.map(_valid_one).astype("boolean")


def strict_json_gate(extracted: Column, props: Column) -> Column:
    """NULL out an extraction whose source payload is not strict JSON
    — the shared Spark-side form of the oracle's
    ``CASE WHEN json_valid(props) THEN ... END``."""
    from pyspark.sql import functions as F

    return F.when(json_strict_valid(props), extracted)
