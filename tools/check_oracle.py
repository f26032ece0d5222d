"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values TWICE:

1. value-level (exact for non-floats; floats compared after
   ``astype(float)`` so a numeric match is a numeric match), and
2. **representation-level (driver-strict)**: every cell rendered to a
   string the way the driver's hash canonicalization sees it.  The
   driver hashes ``str()`` renderings after pandas conversion — DuckDB
   DECIMAL(24,4) arrives as float64 (``'4719.03'``) while Spark hands
   back ``Decimal('4719.0300')`` — so two value-identical results can
   STILL hash-mismatch (CORRECTNESS_r04: edgar_frames_roundtrip /
   edgar_concept_roundtrip).  The local gate must be at least as
   strict as the driver, hence this second pass.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import sys
import time
from decimal import Decimal

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _cell_repr(v) -> str:
    """Render one cell the way the driver's hash canonicalization does.

    Scalars go through plain ``str()`` — which is exactly where Spark
    ``Decimal('4719.0300')`` and pandas-float64 ``4719.03`` diverge; we
    deliberately do NOT normalize decimal scale here, because the driver
    doesn't.  Nulls, containers, and midnight timestamps (pandas
    ``astype(str)`` renders a midnight-only datetime64 column date-like,
    matching Spark DateType) get the one canonical form both engines
    demonstrably share on the driver's green queries.
    """
    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<null>"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ", ".join(_cell_repr(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {_cell_repr(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, pd.Timestamp):
        if v.hour == v.minute == v.second == 0 and v.microsecond == 0:
            return v.date().isoformat()
        return str(v)
    if isinstance(v, _dt.datetime):
        if v.hour == v.minute == v.second == 0 and v.microsecond == 0:
            return v.date().isoformat()
        return str(v)
    if isinstance(v, np.floating):
        return str(float(v))
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, np.bool_):
        return str(bool(v))
    return str(v)


def strict_canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-sorted, cell-stringified, row-sorted frame — the exact
    surface the driver's value hash runs over."""
    cols = sorted(df.columns)
    out = pd.DataFrame({c: df[c].map(_cell_repr) for c in cols})
    if cols:
        out = out.sort_values(by=cols, ignore_index=True)
    return out


def compare_repr(
    name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame
) -> list[str]:
    """Driver-strict pass: any per-cell string difference is a failure,
    even when the values are numerically identical."""
    problems = []
    s, d = strict_canon(spark_pdf), strict_canon(duck_pdf)
    for c in s.columns:
        eq = s[c] == d[c]
        if not eq.all():
            n_bad = int((~eq).sum())
            i = (~eq).idxmax()
            problems.append(
                f"col {c}: {n_bad} REPR mismatches (driver-hash would fail), "
                f"first: spark={s[c][i]!r} duck={d[c][i]!r}"
            )
    return problems


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    s, d = canon(spark_pdf), canon(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            sv = sv.astype(float)
            dv = dv.astype(float)
            both_nan = sv.isna() & dv.isna()
            eq = (sv == dv) | both_nan
            if not eq.all():
                diff = (sv - dv).abs().max()
                n_bad = int((~eq).sum())
                problems.append(f"col {c}: {n_bad} float mismatches, maxdiff={diff}")
        else:
            sv = sv.astype(str)
            dv = dv.astype(str)
            if not (sv == dv).all():
                n_bad = int((sv != dv).sum())
                i = (sv != dv).idxmax()
                problems.append(
                    f"col {c}: {n_bad} mismatches, first: spark={sv[i]!r} duck={dv[i]!r}"
                )
    if not problems:
        problems.extend(compare_repr(name, spark_pdf, duck_pdf))
    return problems


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    import __spark_entry__ as entrymod
    from sec_edgar_spark.session import get_spark

    spark = get_spark(app_name="check-oracle")
    con = duck_connect(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # drop caches a previous query pinned (several operators
            # cache intermediates consumed by multiple branches) so the
            # sweep's memory footprint stays per-query
            spark.catalog.clearCache()
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL  {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            passed.append(name)
            print(f"ok    {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")

    print(
        f"\n{len(passed)} ok, {len(rows_only)} rows-only, {len(failed)} failed"
        + (f": {failed}" if failed else "")
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
