"""Salted aggregation + streaming dedup tests."""

import json

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.operators.relational import salted_aggregate


def test_salted_aggregate_matches_direct(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)] + [("cold", 1.0), ("cold", 2.0)],
        ["k", "v"],
    )
    salted = salted_aggregate(
        df, "k",
        {"n": ("v", "count"), "total": ("v", "sum"),
         "mn": ("v", "min"), "mx": ("v", "max")},
        salt_buckets=8,
    )
    direct = df.groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("total"),
        F.min("v").alias("mn"), F.max("v").alias("mx"),
    )
    assert sorted(salted.collect()) == sorted(direct.collect())
    # phase-1 really spreads the hot key across salt buckets
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_salted_aggregate_rejects_non_algebraic(spark):
    df = spark.createDataFrame([("a", 1.0)], ["k", "v"])
    with pytest.raises(ValueError):
        salted_aggregate(df, "k", {"med": ("v", "percentile")})


@pytest.mark.timeout(240)
def test_streaming_dedup_drops_later_copies(spark, tmp_path):
    from sec_edgar_spark.streaming.dedup_stream import dedup_stream

    feed = tmp_path / "docs"
    feed.mkdir()

    def write_batch(name, rows):
        with open(feed / name, "w") as f:
            for doc_id, ts, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "ts": ts, "text": text}) + "\n")

    write_batch(
        "b1.json",
        [(1, "2024-01-01T10:00:00", "hello world"),
         (2, "2024-01-01T10:00:05", "HELLO WORLD  "),  # same normalized content
         (3, "2024-01-01T10:00:10", "different")],
    )
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .json(str(feed))
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.doc_id for r in spark.sql("SELECT * FROM t_dedup").collect()}
        assert len(first) == 2  # one of {1,2} plus 3

        # a later batch re-sends the same content -> dropped
        write_batch("b2.json", [(4, "2024-01-01T10:05:00", "hello world"),
                                (5, "2024-01-01T10:05:01", "brand new")])
        q.processAllAvailable()
        ids = {r.doc_id for r in spark.sql("SELECT * FROM t_dedup").collect()}
        assert 4 not in ids and 5 in ids
    finally:
        q.stop()


def test_media_header_parsers_golden():
    """Pure-byte header parsers against real and synthetic headers."""
    from sec_edgar_spark.operators.multimodal import (
        gif_dimensions,
        jpeg_dimensions,
        media_dimensions,
        png_dimensions,
    )

    with open("tests/data/sample.png", "rb") as fh:
        png = fh.read()
    w, h = png_dimensions(png)
    assert w and h and w > 0 and h > 0
    assert media_dimensions(png) == (w, h)

    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert gif_dimensions(gif) == (320, 200)

    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x04\x00\x00"          # APP0 segment (skipped)
        + b"\xff\xc2\x00\x11\x08"              # SOF2 (progressive)
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
    )
    assert jpeg_dimensions(jpeg) == (640, 480)

    # DHT (C4) must NOT be treated as SOF.
    jpeg_dht_first = (
        b"\xff\xd8"
        + b"\xff\xc4\x00\x04\x00\x00"
        + b"\xff\xc0\x00\x11\x08"
        + (10).to_bytes(2, "big") + (20).to_bytes(2, "big")
    )
    assert jpeg_dimensions(jpeg_dht_first) == (20, 10)

    assert media_dimensions(b"RIFF\x00\x00\x00\x00WAVE") == (None, None)
    assert media_dimensions(b"") == (None, None)
    assert media_dimensions(None) == (None, None)


def test_wav_meta_golden():
    from sec_edgar_spark.operators.multimodal import wav_meta

    def le(v, n):
        return int(v).to_bytes(n, "little")

    fmt = b"fmt " + le(16, 4) + le(1, 2) + le(2, 2) + le(44100, 4) + le(176400, 4) + le(4, 2) + le(16, 2)
    data = b"data" + le(400, 4) + b"\x00" * 400
    wav = b"RIFF" + le(4 + len(fmt) + len(data), 4) + b"WAVE" + fmt + data
    assert wav_meta(wav) == (2, 44100, 100)
    # LIST chunk before fmt must be skipped; odd-length chunk padding honored.
    junk = b"LIST" + le(3, 4) + b"abc" + b"\x00"
    wav2 = b"RIFF" + le(4 + len(junk) + len(fmt) + len(data), 4) + b"WAVE" + junk + fmt + data
    assert wav_meta(wav2) == (2, 44100, 100)
    assert wav_meta(b"RIFF\x00\x00\x00\x00AVI ") == (None, None, None)
    assert wav_meta(None) == (None, None, None)


def test_salted_join_matches_plain_join(spark):
    from sec_edgar_spark.operators.relational import salted_join

    fact = spark.createDataFrame(
        [(k, i) for i in range(200) for k in ("hot", f"k{i % 7}")],
        ["key", "v"],
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k3", 3)], ["key", "d"]
    )
    got = salted_join(fact, dim, "key").groupBy("key").count().collect()
    want = fact.join(dim, "key").groupBy("key").count().collect()
    assert {(r.key, r["count"]) for r in got} == {(r.key, r["count"]) for r in want}


def test_norm_outliers_flags_degenerate(spark):
    from sec_edgar_spark.operators.similarity import norm_outliers

    rows = [(i, [1.0, 0.0, 0.0]) for i in range(20)]
    rows += [(100, [0.001, 0.0, 0.0]), (101, [50.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.is_outlier for r in norm_outliers(df).collect()}
    assert got[100] is True and got[101] is True
    assert not any(got[i] for i in range(20))


def test_l2_normalize_zero_vector_safe(spark):
    from pyspark.sql import functions as F
    from sec_edgar_spark.operators.similarity import l2_normalize

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "id long, embedding array<double>"
    )
    got = {r.id: r.u for r in df.select("id", l2_normalize("embedding").alias("u")).collect()}
    assert abs(got[1][0] - 0.6) < 1e-12 and abs(got[1][1] - 0.8) < 1e-12
    assert got[2] == [0.0, 0.0]


def test_resize_images_plumbing(spark):
    from pyspark.sql import functions as F
    from sec_edgar_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, b"imagebytes"), (2, None)], "media_id long, blob binary"
    )
    got = {
        r.media_id: r
        for r in resize_images(
            df, 64, 64, kernel=lambda b, w, h: b[: w // 8]
        ).collect()
    }
    assert got[1].resized == b"imagebyt"
    assert got[1].out_width == 64 and got[1].out_height == 64
    assert got[2].resized is None and got[2].out_width is None

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        resize_images(df, 64, 64)


def test_cosine_threshold_pairs_matches_bruteforce(spark):
    """Block-decomposed pair enumeration must produce every unordered
    pair exactly once — parity against the naive O(n^2) comparison."""
    import itertools
    import math
    import random

    from sec_edgar_spark.operators.similarity import cosine_threshold_pairs

    rng = random.Random(7)
    vecs = {i: [rng.gauss(0, 1) for _ in range(8)] for i in range(40)}
    # plant a few near-duplicates so the threshold actually selects
    for dup, src in ((40, 3), (41, 17)):
        vecs[dup] = [x + rng.gauss(0, 0.01) for x in vecs[src]]
    # and two ZERO vectors: the degenerate case (NaN cosine) both
    # backends must DROP identically (the round-4 ADVICE divergence —
    # numpy's IEEE compare drops NaN, Spark SQL's ordering keeps it;
    # the operator filters zero norms up front in both paths)
    vecs[42] = [0.0] * 8
    vecs[43] = [0.0] * 8

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    expected = {
        (a, b)
        for a, b in itertools.combinations(sorted(vecs), 2)
        if any(vecs[a]) and any(vecs[b]) and cos(vecs[a], vecs[b]) >= 0.6
    }
    assert expected, "test needs at least one qualifying pair"

    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    for impl in ("arrow", "expr"):
        for n_blocks in (1, 3, 8):
            got = cosine_threshold_pairs(df, 0.6, n_blocks=n_blocks, impl=impl).collect()
            pairs = [(r.id_a, r.id_b) for r in got]
            assert len(pairs) == len(set(pairs)), "pair emitted more than once"
            assert set(pairs) == expected, f"impl={impl} n_blocks={n_blocks}"

    # the two backends must agree bit-for-bit on the cosine values
    ex = {(r.id_a, r.id_b): r.cosine
          for r in cosine_threshold_pairs(df, 0.6, n_blocks=3, impl="expr").collect()}
    ar = {(r.id_a, r.id_b): r.cosine
          for r in cosine_threshold_pairs(df, 0.6, n_blocks=3, impl="arrow").collect()}
    assert ex == ar


def test_cosine_threshold_pairs_rejects_bad_blocks(spark):
    import pytest as _pytest

    from sec_edgar_spark.operators.similarity import cosine_threshold_pairs

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError):
        cosine_threshold_pairs(df, 0.5, n_blocks=0)


def test_kmeans_fixedpoint_clusters_blobs(spark):
    """Planted blobs must land in distinct cells, copies of the same
    blob in the same cell; assignments are deterministic across runs."""
    import random

    from sec_edgar_spark.operators.kmeans import kmeans_fit_assign

    rng = random.Random(3)
    centers = [[10.0] * 8, [-10.0] * 8, [10.0] * 4 + [-10.0] * 4]
    rows = []
    for i in range(60):
        c = centers[i % 3]
        rows.append((i, [x + rng.gauss(0, 0.5) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {
        r.id: r.cell
        for r in kmeans_fit_assign(df, "vec_id", "embedding", k=3, n_iter=3).collect()
    }
    # same planted blob -> same cell; different blobs -> different cells
    for blob in range(3):
        cells = {got[i] for i in range(60) if i % 3 == blob}
        assert len(cells) == 1, f"blob {blob} split across {cells}"
    assert len({got[0], got[1], got[2]}) == 3

    rerun = {
        r.id: r.cell
        for r in kmeans_fit_assign(df, "vec_id", "embedding", k=3, n_iter=3).collect()
    }
    assert rerun == got


def test_bigram_surprisal_matches_pure_python(spark, tmp_path):
    """text_bigram_surprisal vs an independent pure-Python bigram-LM
    on a small corpus: identical n_bigrams / bits_total per doc, and
    the repetitive doc must score BELOW the shuffled-order doc built
    from the same token multiset (the context-awareness the unigram
    scorer lacks — both docs have identical unigram stats)."""
    import itertools
    from collections import Counter

    from sec_edgar_spark.queries.textops import text_bigram_surprisal

    docs = [
        (1, "a b a b a b a b a b a b"),        # repetitive: predictable bigrams
        (2, "a a b b a b b a a b b a"),        # same tokens, scrambled order
        (3, "the quick brown fox jumps"),
        (4, "solo"),                            # 1 token -> excluded
        (5, "the quick brown fox jumps again"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.doc_id: r
        for r in text_bigram_surprisal(spark, str(tmp_path)).collect()
    }
    assert 4 not in got

    # independent reference model
    toks = {i: t.split() for i, t in docs}
    bigrams = Counter(
        itertools.chain.from_iterable(
            zip(a, a[1:]) for a in toks.values() if len(a) >= 2
        )
    )
    ctx = Counter()
    for (w1, _), c in bigrams.items():
        ctx[w1] += c
    vocab = len(set(itertools.chain.from_iterable(toks.values())))
    bits = lambda x: x.bit_length() - 1  # noqa: E731

    for i, a in toks.items():
        if len(a) < 2:
            continue
        ss = [
            bits(ctx[w1] + vocab) - bits(bigrams[(w1, w2)] + 1)
            for w1, w2 in zip(a, a[1:])
        ]
        assert got[i].n_bigrams == len(ss), i
        assert got[i].bits_total == sum(ss), i
    assert got[1].avg_cond_surprisal < got[2].avg_cond_surprisal
