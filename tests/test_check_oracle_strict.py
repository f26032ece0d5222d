"""Regression tests for the driver-strict comparator in
tools/check_oracle.py.

CORRECTNESS_r04 failed edgar_frames_roundtrip / edgar_concept_roundtrip
on hash ONLY: rows and schema matched and the values were numerically
identical, but Spark returned ``Decimal('4719.0300')`` (scale-4 padded)
while the driver canonicalized DuckDB's DECIMAL(24,4) through pandas
float64 (``'4719.03'``).  The old local comparator cast both sides
``astype(float)`` and blessed the mismatch.  These tests pin the strict
representation-level pass that makes the failure reproducible locally.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import pandas as pd

from tools.check_oracle import compare, compare_repr, strict_canon


def test_decimal_scale4_vs_float64_is_flagged():
    # Exactly the r4 shape: Spark side object-dtype Decimals with scale-4
    # trailing zeros, oracle side float64.  Values identical; repr not.
    spark_pdf = pd.DataFrame({"val": [Decimal("4719.0300"), Decimal("12.5000")]})
    duck_pdf = pd.DataFrame({"val": [4719.03, 12.5]})
    problems = compare("frames", spark_pdf, duck_pdf)
    assert problems, "driver-hash-fatal decimal repr divergence must fail locally"
    assert any("REPR" in p for p in problems)


def test_identical_doubles_pass():
    spark_pdf = pd.DataFrame({"val": [4719.03, 12.5], "k": [1, 2]})
    duck_pdf = pd.DataFrame({"k": [2, 1], "val": [12.5, 4719.03]})
    assert compare("ok", spark_pdf, duck_pdf) == []


def test_scale2_decimal_happens_to_match_float_repr():
    # q1's decimal(_,2) path stays green: str(Decimal('123.45')) ==
    # str(123.45) — documents WHY only scale>2 decimals were bitten.
    spark_pdf = pd.DataFrame({"val": [Decimal("123.45")]})
    duck_pdf = pd.DataFrame({"val": [123.45]})
    assert compare("q1ish", spark_pdf, duck_pdf) == []


def test_null_forms_unify():
    spark_pdf = pd.DataFrame({"s": [None, "x"], "f": [float("nan"), 1.0]})
    duck_pdf = pd.DataFrame({"s": ["x", None], "f": [1.0, float("nan")]})
    assert compare("nulls", spark_pdf, duck_pdf) == []


def test_date_vs_midnight_timestamp_unify():
    # Spark DateType -> datetime.date objects; DuckDB DATE -> datetime64
    # midnights.  The driver's pandas astype(str) collapses both to the
    # date string, so the strict pass must too.
    spark_pdf = pd.DataFrame({"d": [datetime.date(2020, 1, 1)]})
    duck_pdf = pd.DataFrame({"d": pd.to_datetime(["2020-01-01"])})
    assert compare("dates", spark_pdf, duck_pdf) == []


def test_arrays_compare_elementwise():
    import numpy as np

    spark_pdf = pd.DataFrame({"a": [np.array([1, 2]), np.array([3])]})
    duck_pdf = pd.DataFrame({"a": [np.array([1, 2]), np.array([3])]})
    assert compare("arrays", spark_pdf, duck_pdf) == []
    # repr pass unifies ndarray/list framing but flags value differences
    bad = pd.DataFrame({"a": [[1, 2], [4]]})
    assert compare_repr("arrays", spark_pdf, bad)
    assert not compare_repr("arrays", spark_pdf, pd.DataFrame({"a": [[1, 2], [3]]}))


def test_strict_canon_sorts_rows_and_columns():
    df = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    out = strict_canon(df)
    assert list(out.columns) == ["a", "b"]
    assert out["a"].tolist() == ["x", "y"]
