"""Streaming quality pipeline — batch/stream parity + bounded dedup."""

import json

import pytest

from sec_edgar_spark.streaming.quality_stream import (
    intake_rollup,
    quality_columns,
    quality_stream,
)

DOCS = [
    (1, "2024-01-01T10:00:00", "the quick brown fox jumps over the lazy dog again today"),
    (2, "2024-01-01T11:00:00", "!!! ??? ### $$$ %%%"),
    (3, "2024-01-01T11:30:00", "the quick brown fox jumps over the lazy dog again today"),  # dup of 1
    (4, "2024-01-02T09:00:00", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (5, "2024-01-02T09:30:00", "short"),
]


def write_feed(feed, name, rows):
    with open(feed / name, "w") as f:
        for doc_id, ts, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "ts": ts, "text": text}) + "\n")


@pytest.fixture
def stream_df(spark, tmp_path):
    feed = tmp_path / "docs"
    feed.mkdir()
    write_feed(feed, "b1.json", DOCS[:3])
    write_feed(feed, "b2.json", DOCS[3:])
    return spark.readStream.schema("doc_id long, ts timestamp, text string").json(
        str(feed)
    )


def batch_df(spark):
    from pyspark.sql import functions as F

    return spark.createDataFrame(DOCS, ["doc_id", "ts_s", "text"]).select(
        "doc_id", F.to_timestamp("ts_s").alias("ts"), "text"
    )


def test_quality_stream_parity_and_dedup(spark, stream_df, tmp_path):
    q = (
        quality_stream(stream_df)
        .writeStream.format("memory")
        .queryName("t_quality")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r.doc_id: r for r in spark.sql("SELECT * FROM t_quality").collect()}
    finally:
        q.stop()

    # doc 3 is an exact duplicate of doc 1 within the watermark -> dropped.
    assert set(rows) == {1, 2, 4, 5}
    assert rows[1].passes_quality is True
    assert rows[2].passes_quality is False  # all punctuation
    assert rows[5].passes_quality is False  # too short

    # Batch twin: same expression set -> same quality values.
    b = {
        r.doc_id: r
        for r in quality_columns(batch_df(spark)).collect()
    }
    for doc_id in (1, 2, 4, 5):
        assert b[doc_id].passes_quality == rows[doc_id].passes_quality
        assert b[doc_id].n_tokens == rows[doc_id].n_tokens
        assert abs(b[doc_id].alpha_ratio - rows[doc_id].alpha_ratio) < 1e-12


def test_intake_rollup_windows(spark, stream_df):
    q = (
        intake_rollup(quality_stream(stream_df, dedup=False))
        .writeStream.format("memory")
        .queryName("t_rollup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_rollup").collect()
    finally:
        q.stop()
    # Append mode emits only windows the watermark has closed: day 1
    # closes once day-2 events advance the watermark past it.
    day1 = [r for r in rows if str(r.window_start).startswith("2024-01-01")]
    got = {(r.passes_quality, r.n_docs) for r in day1}
    assert (True, 2) in got   # docs 1 and 3 (no dedup here)
    assert (False, 1) in got  # doc 2
