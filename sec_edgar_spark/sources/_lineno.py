"""Per-file line numbering for text scans.

The text source has no line-number column, but order-sensitive EDGAR
semantics (A3 running count, "first n" limits — SURVEY §7 risk 2) need
one.  ``with_line_numbers`` assigns a stable per-source-file ordinal
using a window over ``monotonically_increasing_id()``: within one file
split, ids are ascending in file order, so ranking them per file
reproduces line order.

Caveat at scale: a single text file read as MULTIPLE splits keeps
id-order per split but split ordering is by file offset too (partition
index is the high bits of the id), so the ranking stays correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_line_numbers(df: DataFrame, file_col: str) -> DataFrame:
    w = Window.partitionBy(file_col).orderBy("_mono_id")
    return (
        df.withColumn("_mono_id", F.monotonically_increasing_id())
        .withColumn("line_no", F.row_number().over(w).cast("long"))
        .drop("_mono_id")
    )
