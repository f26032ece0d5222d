"""Streaming tar-feed ingestion (S12's continuous form).

EDGAR drops one ``YYYYMMDD.nc.tar.gz`` per business day
(reference daily.py:108-116); a mirror directory of those drops is a
natural file-source stream.  New archives are discovered per
micro-batch and explode through the SAME stateless mapInPandas
extraction the batch path uses (sources/tar_feed.extract_members), so
batch/stream parity holds by construction; the accession derivation
then feeds the J2 match or the metadata sink downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tar_feed import TAR_MEMBER, extract_members, members_with_accession


def read_tar_feed_stream(
    spark: SparkSession, watch_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """readStream over a directory of feed archives → member rows with
    derived accession numbers.

    One archive per row per micro-batch (archives are the unit of
    work, exactly like the batch scan); ``maxFilesPerTrigger`` bounds
    per-batch memory to N archives per executor wave.
    """
    bins = (
        spark.readStream.format("binaryFile")
        # binaryFile's fixed schema, stated explicitly (streaming
        # sources don't infer).
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.tar.gz")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(watch_dir)
    )
    extracted = bins.select("path", "content").mapInPandas(
        extract_members, TAR_MEMBER
    )
    return members_with_accession(extracted)
