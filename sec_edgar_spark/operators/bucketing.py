"""Bucketed-table layout: shuffle-free co-located joins and aggs.

The single biggest shuffle in a 100 TB warehouse is the fact-fact join
(lineitem ⋈ orders on the order key): both sides are far too big to
broadcast, so every query pays a full re-partition of both tables.
Spark's answer is table bucketing — write each table ONCE hash-
clustered into N buckets on the join key (optionally sorted within
buckets); every subsequent equi-join or aggregation on that key reads
bucket i of each side into the same task and runs with ZERO Exchange
(and, with ``sortBy``, zero Sort: the sort-merge join streams the
pre-sorted buckets directly).

This is the write-time twin of the runtime devices the battery already
ships (broadcast, AQE skew split, salting): pay one clustering write,
amortize it over every downstream join/agg on the key.  The bucket
count is the read-side parallelism knob and must MATCH on both sides
for the co-located path (Spark requires equal bucket counts or, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``, an integer
ratio).

Hash semantics: bucket assignment is Murmur3 on the key (Spark's
``hash``), the same function ``HashPartitioning`` uses for shuffles —
which is exactly why a bucketed scan satisfies the join's required
distribution without an Exchange.

Sorted reads: the reader only trusts within-bucket sort order under
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (off by
default since 3.0 because a multi-file bucket voids the guarantee).
``write_bucketed`` makes the conf safe by construction — it emits
exactly ONE file per bucket (see the repartition note below).  With
the conf set the join plan drops its Sorts too; without it the join
is still shuffle-free and pays only a sort of already-sorted runs.

Plan contracts are pytest-asserted (tests/test_bucketing.py): the
bucketed join plan contains no Exchange and no per-query Sort, equals
the plain shuffled join row-for-row, and the bucketed groupBy skips
its exchange too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
) -> None:
    """Write ``df`` as an EXTERNAL parquet table hash-clustered into
    ``n_buckets`` buckets on ``bucket_cols`` (sorted within each bucket
    by ``sort_cols`` when given).

    Bucketing metadata lives in the session catalog (only
    ``saveAsTable`` can record it — a bare ``save()`` writes the same
    files but downstream scans can't prove the clustering), while the
    data files live at ``path`` so the caller owns their lifecycle.
    ``mode("overwrite")`` makes re-runs idempotent.
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    # One FILE per bucket: the reader only trusts within-bucket
    # sortedness (and skips its merge-side Sort) when every bucket is
    # a single file.  Repartitioning on the bucket columns with the
    # bucket count uses the same Murmur3 hash as the bucket
    # assignment, so each write task holds exactly one bucket's rows
    # and emits exactly one file.  At cluster scale this repartition
    # is the clustering write's entire (one-time) shuffle cost.
    df = df.repartition(n_buckets, *[df[c] for c in bucket_cols])
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Scan a bucketed table (bucket metadata rides along from the
    catalog; the DataFrame is ordinary otherwise)."""
    return spark.table(table_name)


def drop_bucketed(spark: SparkSession, *table_names: str) -> None:
    """Drop catalog entries (external data files are left to the
    caller/tmpdir)."""
    for t in table_names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
