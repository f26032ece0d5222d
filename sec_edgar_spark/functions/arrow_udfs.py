"""The two Arrow UDF flavors the battery doesn't otherwise need:
vectorized SCALAR ``pandas_udf`` and GROUPED_AGG ``pandas_udf``.

Policy context: this repo keeps analytics hot paths JVM-side (the
plan audit hard-fails ArrowEvalPython outside a whitelist), and every
production Python boundary ships as mapInPandas / applyInPandas /
applyInPandasWithState / a UDTF (parsing, multimodal kernels, state
machines).  These two helpers complete the §2.10 UDF surface for the
cases where a user's own numerical kernel has no JVM expression — the
contract tested in tests/test_arrow_udfs.py is Arrow-batch semantics
and exact agreement with the built-in equivalents, so a real kernel
can be dropped in with confidence about the plumbing.

- Scalar: batches arrive as pandas Series (Arrow columnar, NOT rows);
  the kernel below is numpy-vectorized digit-sum — the shape a custom
  math function takes.
- Grouped-agg: the whole group's column arrives as one Series; usable
  in ``groupBy().agg()`` and as a window function.  Exact int64 sum
  of squares — the shape a custom estimator takes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("bigint")
def digit_sum(x: pd.Series) -> pd.Series:
    """Vectorized decimal digit sum of an integer column (Arrow scalar
    UDF — one numpy pass per batch, never per row).  NULL inputs stay
    NULL (not 0); negative inputs sum the digits of the magnitude
    (numpy's floored // with sign-flipping % would otherwise produce
    garbage on negatives)."""
    import numpy as np

    null_mask = x.isna()
    v = np.abs(x.to_numpy(dtype="int64", na_value=0)).copy()
    out = np.zeros_like(v)
    while (v > 0).any():
        out += v % 10
        v //= 10
    # Nullable Int64 keeps the result integral end-to-end: assigning
    # None into a plain int64 Series would upcast to float64+NaN and
    # lean on an unsafe float->bigint Arrow cast (fails outright under
    # spark.sql.execution.pandas.convertToArrowArraySafely=true).
    res = pd.Series(out, dtype="Int64")
    res[null_mask.to_numpy()] = pd.NA
    return res


@pandas_udf("bigint")
def sum_of_squares(y: pd.Series) -> int:
    """Exact int64 Σy² per group (Arrow GROUPED_AGG UDF: the group's
    column arrives as ONE Series; also valid over an unbounded window
    frame)."""
    v = y.to_numpy(dtype="int64", na_value=0)
    return int((v * v).sum())
