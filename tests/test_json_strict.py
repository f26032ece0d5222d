"""Strict-JSON validity gate (functions/jsonx.py) — cross-engine
contract pins (ADVICE r11: trailing-garbage payloads).

Three layers:
1. the gate's Python kernel vs DuckDB ``json_valid`` over an edge
   matrix (agreement everywhere EXCEPT the documented trailing-comma
   divergence, which is pinned as a divergence so a silent behavior
   change on either side fails here);
2. the Spark plan shape: the gate is an Arrow scalar UDF
   (ArrowEvalPython), never a row-at-a-time BatchEvalPython;
3. end-to-end: the gated extraction NULLs a trailing-garbage payload
   that Spark's builtin JSON surface would happily extract from.
"""

import json

import duckdb
import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.functions.jsonx import _valid_one, strict_json_gate

# (payload, expected_gate, duckdb_json_valid_agrees)
MATRIX = [
    ('{"k": 99}', True, True),
    ('  {"k": 5}  ', True, True),
    ('{"k": 99} trash', False, True),
    ('{"k": 99}}', False, True),
    ('{"k": 1} {"k": 2}', False, True),
    ('{not json', False, True),
    ("", False, True),
    ("true", True, True),
    ("  42  ", True, True),
    ('"str"', True, True),
    ("[1,2]", True, True),
    ('{"k": NaN}', True, True),
    ('{"k": Infinity}', True, True),
    ("NaN", True, True),
    ("1e999", True, True),
    ("01", False, True),
    ('{"k": 01}', False, True),
    ('"a\tb"', False, True),  # unescaped control char
    ('{"a": {"b": [1, {"c": null}]}}', True, True),
    # KNOWN divergence (yyjson relaxed trailing-comma flag): the gate
    # keeps the RFC answer, DuckDB says valid.  agrees=False pins the
    # divergence itself — if either side changes, this test notices.
    ("[1,2,]", False, False),
    ('{"k":1,}', False, False),
]


def test_kernel_matches_duckdb_json_valid():
    con = duckdb.connect()
    for payload, want, agrees in MATRIX:
        got = _valid_one(payload)
        assert got is want, f"gate({payload!r}) = {got}, want {want}"
        duck = bool(
            con.execute("SELECT json_valid(?)", [payload]).fetchone()[0]
        )
        if agrees:
            assert duck == want, (
                f"json_valid({payload!r}) = {duck} no longer matches the "
                f"gate ({want}) — undocumented engine drift"
            )
        else:
            assert duck != want, (
                f"documented divergence on {payload!r} disappeared — "
                "update jsonx.py's contract note and this matrix"
            )


def test_kernel_null_and_rfc_sanity():
    assert _valid_one(None) is False
    # json.loads defaults (the documented contract basis)
    assert json.loads('{"k": NaN}')["k"] != json.loads('{"k": NaN}')["k"]


def test_gate_nulls_trailing_garbage_end_to_end(spark):
    rows = [
        (1, '{"k": 99} trash'),
        (2, '{"k": 77}'),
        (3, "{not json"),
        (4, None),
        (5, '{"k": NaN}'),
    ]
    df = spark.createDataFrame(rows, "id bigint, props string")
    out = (
        df.select(
            "id",
            strict_json_gate(
                F.get_json_object("props", "$.k").try_cast("bigint"),
                F.col("props"),
            ).alias("k"),
        )
        .orderBy("id")
        .collect()
    )
    got = {r.id: r.k for r in out}
    # builtin alone would extract 99 from row 1 — the gate must NULL it
    assert got == {1: None, 2: 77, 3: None, 4: None, 5: None}


def test_gate_plan_is_arrow_not_row_udf(spark):
    df = spark.createDataFrame([(1, "{}")], "id bigint, props string")
    plan = (
        df.select(
            strict_json_gate(
                F.get_json_object("props", "$.k").try_cast("bigint"),
                F.col("props"),
            ).alias("k")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


@pytest.mark.slow
def test_poison_replica_has_partial_json_rows(spark):
    import os

    sf = os.path.join(
        os.path.dirname(__file__), "..", "testdata_sf0.001_poison"
    )
    if not os.path.exists(os.path.join(sf, "events.parquet")):
        pytest.skip("poison replica not built")
    props = {
        r.event_id: r.props
        for r in spark.read.parquet(os.path.join(sf, "events.parquet"))
        .filter(F.col("event_id").between(100063, 100066))
        .collect()
    }
    assert props[100063] == '{"k": 99} trash'
    assert props[100066] == '{"k": NaN}'
