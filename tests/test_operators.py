"""Operator-level tests: dedup correctness, similarity, multimodal,
relational helpers, filing-fetch pacing."""

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators import dedup as D
from sec_edgar_spark.operators import multimodal as M
from sec_edgar_spark.operators import relational as R
from sec_edgar_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different content about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "xy"),  # too short to shingle
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_shingle_rows(spark, docs):
    sh = D.shingle_rows(docs, "doc_id", "text", 3)
    by_doc = {
        r.doc_id: r.n for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert by_doc[1] == 7  # 9 tokens -> 7 trigrams, all distinct
    assert 5 not in by_doc


def test_minhash_lsh_finds_near_dups(spark, docs):
    sigs = D.minhash_signatures(docs, "doc_id", "text", num_hashes=12)
    bands = D.minhash_band_keys(sigs, "doc_id", bands=4, rows_per_band=3)
    pairs = D.lsh_candidate_pairs(bands, "doc_id")
    sets = D.shingle_sets(docs, "doc_id", "text", 3)
    verified = D.jaccard_verify(pairs, sets, "doc_id", threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    assert got[(1, 4)] == 1.0  # exact dup -> jaccard 1
    assert (1, 2) in got and 0.5 <= got[(1, 2)] < 1.0
    assert all(3 not in p for p in got)


def test_simhash_close_for_near_dups(spark, docs):
    fp = {r.doc_id: r.simhash for r in D.simhash_fingerprints(docs, "doc_id", "text").collect()}
    assert fp[1] == fp[4]
    ham_12 = bin(fp[1] ^ fp[2]).count("1")
    ham_13 = bin(fp[1] ^ fp[3]).count("1")
    assert ham_12 < ham_13


def test_cosine_topk_self_is_best_neighbor_of_dup(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = SIM.cosine_topk(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    ordered = [r.neighbor_id for r in sorted(got, key=lambda r: r.rk)]
    assert ordered == [1, 2]


def test_topk_and_running_count(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "d")],
        ["grp", "ord", "val"],
    )
    top2 = R.topk_per_group(df, ["grp"], [F.desc("ord")], 2)
    assert {(r.grp, r.val) for r in top2.collect()} == {(1, "c"), (1, "b"), (2, "d")}
    rc = R.running_count(df, [F.asc("ord")], partition_by=["grp"])
    got = {(r.grp, r.ord): r.num_previously_valid for r in rc.collect()}
    assert got[(1, 10)] == 0 and got[(1, 30)] == 2 and got[(2, 5)] == 0


def test_multimodal_meta_and_features(spark, data_dir):
    with open(f"{data_dir}/sample.png", "rb") as f:
        png = f.read()
    df = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "image", bytearray(b"\xff\xd8\xffJPEG")), (3, "audio", None)],
        ["media_id", "kind", "blob"],
    )
    meta = {r.media_id: r for r in M.decode_image_meta(df).collect()}
    assert meta[1].format == "png" and meta[1].width == 64 and meta[1].height == 48
    assert meta[2].format == "jpeg" and meta[2].width is None
    assert meta[3].format is None and meta[3].n_bytes is None

    with pytest.raises(NotImplementedError):
        M.extract_features(df)

    feats = M.extract_features(
        df, kernel=lambda b: [float(len(b)), float(b[0])], blob_col="blob"
    )
    got = {r.media_id: r.features for r in feats.collect()}
    assert got[1] == [float(len(png)), 137.0]
    assert got[3] is None


def test_fetch_urls_paces_and_caps(spark):
    from sec_edgar_spark.sources.filings import fetch_urls

    urls = spark.createDataFrame([(f"u{i}",) for i in range(7)], ["url"])
    got = fetch_urls(urls, lambda u: (200, u.encode()), rate_limit=5).collect()
    assert len(got) == 7
    assert all(r.status == 200 and bytes(r.content) == r.url.encode() for r in got)
    with pytest.raises(ValueError):
        fetch_urls(urls, lambda u: (200, b""), rate_limit=11)


def test_compression_ratios_golden(spark):
    """Exact zlib sizes for pinned inputs; highly repetitive text
    compresses far below the random-ish text."""
    import zlib

    from sec_edgar_spark.operators.text_analysis import compression_ratios

    rep = "spam " * 200
    mixed = " ".join("w%d" % (i * 7919 % 10000) for i in range(200))
    df = spark.createDataFrame(
        [(1, rep), (2, mixed), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in compression_ratios(df, "doc_id", "text").collect()}
    assert rows[1].n_bytes == len(rep.encode())
    assert rows[1].n_compressed == len(zlib.compress(rep.encode(), 6))
    assert rows[2].n_compressed == len(zlib.compress(mixed.encode(), 6))
    assert rows[1].ratio < 0.05 < rows[2].ratio
    # Empty docs: NULL ratio (distinguishable from incompressible),
    # never a header-overhead sentinel.
    assert rows[3].n_bytes == 0 and rows[3].ratio is None
    assert rows[4].n_bytes == 0 and rows[4].ratio is None  # null -> empty
