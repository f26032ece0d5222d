"""The embedding intake validity gate (POISON.md): the Spark predicate
(functions/vectors.is_valid) and the oracle SQL clause
(queries/similarity.EMB_VALID_WHERE) must accept EXACTLY the same
vectors — a one-sided gate silently diverges every gated scoring query
on hostile rows.  Cases mirror tools/poison_corpus.py: zero vector,
denormal, garbage magnitude, NULL vector, NULL element, NaN, +/-inf,
and a plain valid one."""

import duckdb
import pytest

from sec_edgar_spark.functions import vectors as V

DIM = 4

CASES = {
    0: [0.1, -0.2, 0.3, 0.4],          # valid
    1: [0.0, 0.0, 0.0, 0.0],           # zero norm -> invalid
    2: [1e-30] * DIM,                   # denormal-but-finite -> valid
    3: [1e30] * DIM,                    # garbage magnitude -> invalid
    4: None,                            # NULL vector -> invalid
    5: [0.1, None, 0.3, 0.4],          # NULL element -> invalid
    6: [float("nan")] * DIM,            # NaN -> invalid
    7: [float("inf"), 0.0, 0.0, 0.0],   # inf -> invalid
    8: [-1e6, 0.0, 0.0, 0.0],           # exactly at the bound -> valid
    9: [-0.0, 0.0, 0.0, 0.0],           # negative zero only -> invalid
}
EXPECT_VALID = {0, 2, 8}


def _duck_valid() -> set:
    from sec_edgar_spark.queries.similarity import EMB_VALID_WHERE

    con = duckdb.connect()
    con.execute("CREATE TABLE t (vec_id BIGINT, embedding FLOAT[])")
    for vid, vec in CASES.items():
        con.execute("INSERT INTO t VALUES (?, ?)", (vid, vec))
    # NaN/inf can't ride through parameter binding as FLOAT[]; patch in
    con.execute(
        "UPDATE t SET embedding = ['nan'::FLOAT, 'nan'::FLOAT,"
        " 'nan'::FLOAT, 'nan'::FLOAT] WHERE vec_id = 6"
    )
    con.execute(
        "UPDATE t SET embedding = ['inf'::FLOAT, 0, 0, 0] WHERE vec_id = 7"
    )
    sql = EMB_VALID_WHERE.replace("embeddings", "t")
    return {
        r[0]
        for r in con.execute(
            f"SELECT vec_id FROM t WHERE {sql}"
        ).fetchall()
    }


def test_gates_agree_and_match_contract(spark):
    duck = _duck_valid()
    assert duck == EXPECT_VALID

    rows = [(vid, vec) for vid, vec in CASES.items()]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r[0]
        for r in df.filter(V.is_valid("embedding")).select("vec_id").collect()
    }
    assert got == EXPECT_VALID == duck


def test_max_abs_parameter(spark):
    df = spark.createDataFrame(
        [(0, [5.0, 0.0]), (1, [50.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r[0]
        for r in df.filter(V.is_valid("embedding", max_abs=10.0))
        .select("vec_id")
        .collect()
    }
    assert got == {0}
