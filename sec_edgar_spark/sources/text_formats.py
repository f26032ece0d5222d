"""Robust CSV/JSON ingest: schema-enforced reads that QUARANTINE bad
rows instead of failing the job or silently dropping data.

At 100 TB the ingest tier's first real problem is that some fraction
of rows is malformed (truncated lines, wrong delimiters, bad JSON).
Spark's reader modes encode three policies:

- PERMISSIVE (default here): parse what parses; capture the raw text
  of every unparseable row in ``_corrupt_record`` so it can be counted,
  alerted on, and re-driven — the only mode that conserves data.
- DROPMALFORMED: silently discards bad rows — forbidden in this repo's
  ingest paths (a silent 0.1% loss at 100 TB is a gigabyte of data
  nobody knows is gone).
- FAILFAST: for ingest of data that MUST be clean (manifests,
  configs) where a bad row means the upstream producer is broken.

The quarantine contract (tests/test_text_formats.py): good rows parse
to typed columns, bad rows appear EXACTLY ONCE in the corrupt column
with their raw text, and good+bad == input lines.

Explicit schemas always: schema inference is a full extra pass over
100 TB and type-flaps between loads; these helpers refuse to infer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def read_csv_robust(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema-enforced CSV read with corrupt-row quarantine.

    ``schema`` is the DDL of the GOOD columns; the corrupt column is
    appended here.  Spark only populates ``_corrupt_record`` when it
    is part of the declared schema.
    """
    full = f"{schema}, {CORRUPT_COL} STRING"
    return (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_json_robust(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Schema-enforced JSON-lines read with corrupt-row quarantine."""
    full = f"{schema}, {CORRUPT_COL} STRING"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad): bad rows are those with a captured corrupt record;
    good rows have it NULL.  The bad frame keeps only the raw text —
    its typed columns are meaningless.

    The cache is REQUIRED, not an optimization: Spark disallows
    referencing only ``_corrupt_record`` against a raw CSV/JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) because the
    parser would have to re-parse with a different projection; the
    documented contract is to materialize once, then split.
    """
    from pyspark.sql import functions as F

    df = df.cache()
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return good, bad
