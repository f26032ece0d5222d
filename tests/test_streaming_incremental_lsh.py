"""Streaming incremental LSH dedup: wave-order invariance (streaming
matches == one-shot symmetric batch pipeline), index growth, and
exactly-once replay."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _norm(rows):
    """Normalize to unordered (lo, hi, round(jaccard, 9)) tuples."""
    return sorted(
        (min(r[0], r[1]), max(r[0], r[1]), round(r[2], 9)) for r in rows
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_stream_matches_equal_batch_pipeline(spark, tmp_path):
    """Driving the corpus through in 3 arbitrary waves must yield
    exactly the one-shot symmetric minhash_lsh_dedup pairs: band keys
    are per-document, so two docs collide identically whether they met
    inside one batch or across the index probe."""
    from sec_edgar_spark.operators.dedup import minhash_lsh_dedup
    from sec_edgar_spark.streaming.incremental_lsh import (
        read_matches,
        run_incremental_dedup,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    feed = tmp_path / "feed"
    root = str(tmp_path / "store")
    d.filter(F.col("doc_id") % 3 == 0).write.parquet(str(feed / "w1"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1000")
        .parquet(str(feed) + "/*")
    )
    q = run_incremental_dedup(
        stream, root, checkpoint=str(tmp_path / "ckpt"), query_name="t_ilsh"
    )
    try:
        q.processAllAvailable()
        d.filter(F.col("doc_id") % 3 == 1).write.parquet(str(feed / "w2"))
        q.processAllAvailable()
        d.filter(F.col("doc_id") % 3 == 2).write.parquet(str(feed / "w3"))
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    got = _norm(
        (r.new_id, r.corpus_id, r.jaccard)
        for r in read_matches(spark, root).collect()
    )
    want = _norm(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_dedup(
            d, "doc_id", "text", num_hashes=12, bands=4, rows_per_band=3,
            threshold=0.2,
        ).collect()
    )
    assert got == want and len(want) > 0
    # the index holds every ingested doc exactly once
    n_docs_with_shingles = (
        spark.read.parquet(f"{root}/sets").select("doc_id").distinct().count()
    )
    assert (
        spark.read.parquet(f"{root}/sets").count() == n_docs_with_shingles
    )


def test_upsert_replay_is_idempotent(spark, tmp_path):
    """A replayed (batch_id, batch) after a crash is a no-op: no
    duplicate matches, no duplicate index rows."""
    from sec_edgar_spark.streaming.incremental_lsh import (
        lsh_upsert_batch,
        read_matches,
    )

    root = str(tmp_path / "store")
    txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b0 = spark.createDataFrame([(1, txt), (2, "unrelated words here")],
                               "doc_id long, text string")
    b1 = spark.createDataFrame([(3, txt + " lambda")],
                               "doc_id long, text string")
    lsh_upsert_batch(spark, root, b0, batch_id=0)
    lsh_upsert_batch(spark, root, b1, batch_id=1)
    snap = _norm(
        (r.new_id, r.corpus_id, r.jaccard)
        for r in read_matches(spark, root).collect()
    )
    assert len(snap) == 1  # doc 3 matches doc 1
    n_bands = spark.read.parquet(f"{root}/bands").count()
    # replay both — nothing may change
    lsh_upsert_batch(spark, root, b1, batch_id=1)
    lsh_upsert_batch(spark, root, b0, batch_id=0)
    assert (
        _norm(
            (r.new_id, r.corpus_id, r.jaccard)
            for r in read_matches(spark, root).collect()
        )
        == snap
    )
    assert spark.read.parquet(f"{root}/bands").count() == n_bands
    # a genuinely new batch still matches against the grown index
    b2 = spark.createDataFrame([(4, txt)], "doc_id long, text string")
    lsh_upsert_batch(spark, root, b2, batch_id=2)
    after = read_matches(spark, root)
    assert after.filter(F.col("new_id") == 4).count() >= 2  # hits 1 and 3


def test_torn_replay_no_reversed_pairs_no_self_match(spark, tmp_path):
    """Marker-less crash window (code review r6): the batch's bands
    already landed in the store, then the marker write was lost.  The
    replay probes an index CONTAINING its own docs — without the
    batch-id anti-join it would emit intra-batch pairs a second time in
    reversed orientation (un-collapsible by ordered dedup) and
    self-matches."""
    import os

    from sec_edgar_spark.streaming.incremental_lsh import (
        lsh_upsert_batch,
        read_matches,
    )

    root = str(tmp_path / "store")
    txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b0 = spark.createDataFrame(
        [(1, txt), (3, txt + " lambda")], "doc_id long, text string"
    )
    lsh_upsert_batch(spark, root, b0, batch_id=0)
    snap = sorted(
        (r.new_id, r.corpus_id)
        for r in read_matches(spark, root).collect()
    )
    assert snap == [(1, 3)]  # intra-batch pair, id_a < id_b
    # crash window: writes landed, marker lost
    os.remove(os.path.join(root, "_last_batch_id"))
    lsh_upsert_batch(spark, root, b0, batch_id=0)
    got = sorted(
        (r.new_id, r.corpus_id)
        for r in read_matches(spark, root).collect()
    )
    assert got == snap  # no (3, 1) reversal, no (1, 1)/(3, 3)
    # candidate fan-out stays single despite the double band append:
    # the index read dedups on (doc_id, band)
    b1 = spark.createDataFrame([(5, txt)], "doc_id long, text string")
    lsh_upsert_batch(spark, root, b1, batch_id=1)
    m5 = read_matches(spark, root).filter(F.col("new_id") == 5)
    assert sorted(r.corpus_id for r in m5.collect()) == [1, 3]
