"""Curation operators (operators/sampling.py) — unit semantics."""

from pyspark.sql import functions as F

from sec_edgar_spark.operators.sampling import (
    decontaminate,
    hash_bucket,
    hash_sample,
    pack_sequences,
    split_assign,
)


def test_hash_sample_is_deterministic_and_rateish(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, "k", 10).collect()}
    b = {r.k for r in hash_sample(df, "k", 10).collect()}
    assert a == b  # re-run stable
    assert 100 < len(a) < 320  # ~10% of 2000, generous band
    # rate nesting: 5% sample is a subset of the 10% sample
    c = {r.k for r in hash_sample(df, "k", 5).collect()}
    assert c <= a


def test_split_assign_partitions_everything(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    got = df.select("k", split_assign("k").alias("s")).groupBy("s").count()
    counts = {r.s: r["count"] for r in got.collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 1000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_pack_sequences_boundaries(spark):
    rows = [(i, 100) for i in range(10)]  # 10 docs x 100 tokens
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = {
        r.doc_id: r.pack_id
        for r in pack_sequences(df, "doc_id", "n_tokens", budget=250).collect()
    }
    # preceding totals: 0,100,200,300,... -> packs 0,0,0,1,1,2,2,2,3,3
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}


def test_decontaminate_exact_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),        # contains eval 8-gram
            (2, "totally different words one two three four five six"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, "a b c d e f g h")], ["doc_id", "text"]
    )
    got = decontaminate(train, eval_df, "doc_id", "text", n=8).collect()
    assert {(r.doc_id, r.n_overlapping_shingles) for r in got} == {(1, 1)}


def test_pack_ffd_invariants(spark):
    from sec_edgar_spark.operators.sampling import pack_sequences_ffd

    rows = [(i, "en", t) for i, t in enumerate([300, 300, 200, 200, 100, 600])]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_tokens"])
    got = pack_sequences_ffd(df, "doc_id", "n_tokens", budget=512, partition_col="lang").collect()
    assert len(got) == 6  # every doc packed exactly once
    fills = {}
    for r in got:
        fills.setdefault(r.pack_id, 0)
        fills[r.pack_id] += r.n_tokens
    # no pack over budget except oversized singletons
    for pid, fill in fills.items():
        members = [r for r in got if r.pack_id == pid]
        assert fill <= 512 or len(members) == 1
    # FFD packs 300+200, 300+200, 100, 600 -> 4 packs (vs 5 contiguous)
    assert len(fills) == 4
