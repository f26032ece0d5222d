"""S12 — bulk tar feed ingestion (reference _index.py:215-259,
daily.py:108-116).

The reference's ``download_all=True`` path downloads each day's
``YYYYMMDD.nc.tar.gz`` feed archive, unpacks it with a thread pool, and
relocates members that match the day's filing URLs.  Spark-first
re-expression:

- ``daily_tar_urls`` — the same URL arithmetic, including the
  reference's "bulk downloading is only available starting 1995 Q3"
  guard (daily.py:108-116).
- ``read_tar_feed`` — ``binaryFile`` scan of ``*.tar.gz`` archives →
  ``mapInPandas`` extraction into one row per member (archive, member,
  size, content).  Each task holds ONE archive in memory at a time
  (an Arrow batch row); archives parallelize across executors, which
  replaces the reference's thread-pool unpack queue.
- member→accession join: ``members_with_accession`` derives the
  accession number from the member filename so the existing J2
  accession↔file match (queries/edgar2.py) applies unchanged —
  the Spark equivalent of the reference's ``_move_to_dest`` URL match
  (_index.py:262-297).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TAR_MEMBER = StructType(
    [
        StructField("archive", StringType()),
        StructField("member", StringType()),
        StructField("size", LongType()),
        StructField("content", BinaryType()),
    ]
)


def daily_tar_urls(base: str, date) -> list[str]:
    """Feed-archive URL(s) for one day (reference daily.py:108-116).

    Raises on pre-1995-Q3 dates exactly like the reference.
    """
    quarter = (date.month - 1) // 3 + 1
    if date.year < 1995 or (date.year == 1995 and quarter < 3):
        raise ValueError("Bulk downloading is only available starting 1995 Q3.")
    return [
        "{base}Archives/edgar/Feed/{year}/QTR{q}/{token}.nc.tar.gz".format(
            base=base, year=date.year, q=quarter, token=date.strftime("%Y%m%d")
        )
    ]


def read_tar_feed(spark: SparkSession, path_glob: str) -> DataFrame:
    """``*.tar.gz`` archives → one row per member.

    ``binaryFile`` rows arrive one archive per row; the extraction is a
    streaming ``tarfile`` walk yielding one Arrow batch per archive, so
    peak memory per task is one archive + one member.  Compressed
    formats other than gzip (``r:*``) open transparently.
    """

    bins = spark.read.format("binaryFile").load(path_glob)
    return bins.select("path", "content").mapInPandas(extract_members, TAR_MEMBER)


def extract_members(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body shared verbatim by the batch scan and the
    streaming twin (streaming/tar_stream.py) — batch/stream parity by
    construction.

    A corrupt archive (truncated gzip, bad tar header) must not abort
    a fleet-wide scan: it yields one sentinel row (member NULL, the
    error text in ``content``) so the failure is visible and joinable,
    and every other archive still extracts.
    """
    import io
    import tarfile

    for pdf in batches:
        for path, data in zip(pdf["path"], pdf["content"]):
            members, sizes, contents = [], [], []
            try:
                with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
                    for info in tf:
                        if not info.isfile():
                            continue
                        fh = tf.extractfile(info)
                        if fh is None:
                            continue
                        members.append(info.name)
                        sizes.append(info.size)
                        contents.append(fh.read())
            except (tarfile.TarError, EOFError, OSError) as exc:
                yield pd.DataFrame(
                    {
                        "archive": [path],
                        "member": [None],
                        "size": [None],
                        "content": [f"EXTRACT_ERROR: {exc!r}".encode()],
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "archive": [path] * len(members),
                    "member": members,
                    "size": sizes,
                    "content": contents,
                }
            )


def members_with_accession(members: DataFrame) -> DataFrame:
    """Derive the accession number from each member filename.

    Feed members are named ``<accession>.<ext>`` (e.g.
    ``0000320193-20-000010.nc``); anything without the
    ``nnnnnnnnnn-nn-nnnnnn`` shape gets NULL — same effect as the
    reference only relocating members whose name matches a filing URL
    (_index.py:285-296).
    """
    acc = F.regexp_extract(
        F.element_at(F.split("member", "/"), -1),
        r"([0-9]{10}-[0-9]{2}-[0-9]{6})",
        1,
    )
    return members.withColumn(
        "accession_number", F.when(acc != "", acc)
    )
