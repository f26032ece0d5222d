"""S12 tar feed ingestion (reference _index.py:215-259, daily.py:108-116)."""

import datetime
import io
import tarfile

import pytest

from sec_edgar_spark.sources.tar_feed import (
    daily_tar_urls,
    members_with_accession,
    read_tar_feed,
)


def make_tar(path, files):
    with tarfile.open(path, "w:gz") as tf:
        for name, data in files.items():
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def test_daily_tar_urls_shape():
    urls = daily_tar_urls(
        "https://www.sec.gov/", datetime.date(2020, 1, 28)
    )
    assert urls == [
        "https://www.sec.gov/Archives/edgar/Feed/2020/QTR1/20200128.nc.tar.gz"
    ]


@pytest.mark.parametrize(
    "d", [datetime.date(1994, 12, 30), datetime.date(1995, 5, 1)]
)
def test_daily_tar_urls_pre_1995q3_raises(d):
    with pytest.raises(ValueError, match="1995 Q3"):
        daily_tar_urls("https://www.sec.gov/", d)


def test_read_tar_feed_extracts_members(spark, tmp_path):
    make_tar(
        tmp_path / "20200128.nc.tar.gz",
        {
            "0000320193-20-000010.nc": b"filing one",
            "0000789019-20-000123.nc": b"filing two",
        },
    )
    make_tar(tmp_path / "20200129.nc.tar.gz", {"corr/0001018724-20-000456.nc": b"x" * 100})

    df = read_tar_feed(spark, str(tmp_path / "*.tar.gz"))
    rows = {r.member: r for r in df.collect()}
    assert len(rows) == 3
    assert rows["0000320193-20-000010.nc"].content == b"filing one"
    assert rows["0000320193-20-000010.nc"].size == 10
    assert rows["corr/0001018724-20-000456.nc"].archive.endswith("20200129.nc.tar.gz")


def test_members_accession_join(spark, tmp_path):
    """Extracted members flow into the existing J2 accession match."""
    make_tar(
        tmp_path / "feed.tar.gz",
        {
            "0000320193-20-000010.nc": b"a",
            "noise/readme.txt": b"b",
        },
    )
    members = members_with_accession(read_tar_feed(spark, str(tmp_path / "feed.tar.gz")))
    got = {r.member: r.accession_number for r in members.collect()}
    assert got["0000320193-20-000010.nc"] == "0000320193-20-000010"
    assert got["noise/readme.txt"] is None

    filings = spark.createDataFrame(
        [("0000320193-20-000010", 320193)], ["accession_number", "cik"]
    )
    joined = members.join(filings, "accession_number").collect()
    assert len(joined) == 1 and joined[0].cik == 320193


def test_tar_feed_stream_matches_batch(spark, tmp_path):
    """Streaming twin: two archive drops, same rows as the batch scan."""
    feed = tmp_path / "feed_stream"
    feed.mkdir()
    make_tar(feed / "20200128.nc.tar.gz", {"0000320193-20-000010.nc": b"one"})

    from sec_edgar_spark.streaming.tar_stream import read_tar_feed_stream

    q = (
        read_tar_feed_stream(spark, str(feed))
        .writeStream.format("memory")
        .queryName("t_tar_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        make_tar(
            feed / "20200129.nc.tar.gz",
            {"0000789019-20-000123.nc": b"two", "junk/readme": b"x"},
        )
        q.processAllAvailable()
        stream_rows = {
            (r.member, r.accession_number, bytes(r.content))
            for r in spark.sql("SELECT * FROM t_tar_stream").collect()
        }
    finally:
        q.stop()

    batch_rows = {
        (r.member, r.accession_number, bytes(r.content))
        for r in members_with_accession(
            read_tar_feed(spark, str(feed / "*.tar.gz"))
        ).collect()
    }
    assert stream_rows == batch_rows
    assert ("0000789019-20-000123.nc", "0000789019-20-000123", b"two") in stream_rows


def test_corrupt_archive_does_not_abort_scan(spark, tmp_path):
    feed = tmp_path / "feed_corrupt"
    feed.mkdir()
    make_tar(feed / "good.tar.gz", {"0000320193-20-000010.nc": b"fine"})
    with open(feed / "bad.tar.gz", "wb") as f:
        f.write(b"\x1f\x8b" + b"this is not a gzip stream at all")

    rows = read_tar_feed(spark, str(feed / "*.tar.gz")).collect()
    good = [r for r in rows if r.member is not None]
    bad = [r for r in rows if r.member is None]
    assert len(good) == 1 and good[0].content == b"fine"
    assert len(bad) == 1
    assert bad[0].archive.endswith("bad.tar.gz")
    assert b"EXTRACT_ERROR" in bytes(bad[0].content)
