"""Token-shard export: distributed write → manifest commit → binary
round-trip equality, orphan invisibility, uint16 bounds."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sec_edgar_spark.sources.shards import (
    read_manifest,
    read_token_shards,
    tokenize_ids,
    write_token_shards,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_roundtrip_real_documents(spark, tmp_path):
    from sec_edgar_spark.operators.sampling import pack_sequences

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = tokenize_ids(d, "doc_id", "text", vocab_size=50_000)
    packed = pack_sequences(
        toks, order_col="doc_id", token_count_col="n_tokens", budget=2048
    ).withColumn("shard", (F.col("pack_id") % 4).cast("string"))
    root = str(tmp_path / "shards")
    n = write_token_shards(packed, root)
    assert n == 4
    # manifest totals match the source
    man = read_manifest(root)
    assert sum(e["n_tokens"] for e in man) == (
        packed.agg(F.sum("n_tokens")).collect()[0][0]
    )
    assert sum(e["n_seqs"] for e in man) == packed.count()
    # binary round-trip: every document's ids come back exactly, in
    # (pack_id, doc_id) order within its shard
    back = read_token_shards(spark, root)
    got = {}
    for r in back.collect():
        got.setdefault(r.shard, []).extend(r.token_ids)
    want = {}
    for r in packed.orderBy("pack_id", "doc_id").collect():
        want.setdefault(str(r.pack_id % 4), []).extend(r.token_ids)
    assert got == want


def test_orphans_invisible_and_vocab_bound(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e")], "doc_id long, text string"
    )
    toks = tokenize_ids(df, "doc_id", "text", vocab_size=100).withColumn(
        "shard", F.lit("0")
    ).withColumn("pack_id", F.lit(0))
    root = str(tmp_path / "s")
    write_token_shards(toks, root)
    # an orphan .bin from a dead task attempt — not in the manifest
    with open(os.path.join(root, "shard-zombie.bin"), "wb") as fh:
        fh.write(b"\x01\x00\x02\x00")
    with open(os.path.join(root, "shard-zombie.idx.json"), "w") as fh:
        json.dump({"offsets": [0], "n_tokens": 2}, fh)
    back = read_token_shards(spark, root)
    assert back.filter(F.col("shard") == "zombie").count() == 0
    assert back.count() == 2  # the two real sequences
    # uint16 overflow is rejected up front
    with pytest.raises(ValueError):
        tokenize_ids(df, "doc_id", "text", vocab_size=70_000)


def test_out_of_range_ids_rejected_at_write(spark, tmp_path):
    """A real tokenizer's >uint16 ids must fail the write loudly, not
    wrap silently into committed shards (code review r6)."""
    df = spark.createDataFrame(
        [(1, "0", 0, [1, 2, 70000])],
        "doc_id long, shard string, pack_id long, token_ids array<int>",
    )
    with pytest.raises(Exception, match="out of uint16 range"):
        write_token_shards(df, str(tmp_path / "s"))


def test_concurrent_exports_do_not_interfere(spark, tmp_path):
    """Two concurrent exports of the same data to their own roots (the
    per-run default of curation_export_shards) must both commit
    complete, identical manifests — and the manifest itself commits
    via tmp+os.replace, so no reader can observe a torn _MANIFEST."""
    import threading

    df = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2}") for i in range(40)],
        "doc_id long, text string",
    )
    toks = tokenize_ids(df, "doc_id", "text", vocab_size=1000).withColumn(
        "shard", (F.col("doc_id") % 3).cast("string")
    ).withColumn("pack_id", F.col("doc_id"))
    roots = [str(tmp_path / "runA"), str(tmp_path / "runB")]
    errs = []

    def run(root):
        try:
            write_token_shards(toks, root)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=run, args=(r,)) for r in roots]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    mans = [read_manifest(r) for r in roots]
    assert mans[0] == mans[1]
    assert sum(e["n_seqs"] for e in mans[0]) == 40
    import glob

    for r in roots:
        assert not glob.glob(os.path.join(r, "_MANIFEST.tmp*"))


def test_concurrent_exports_same_root_commit_whole_manifests(
    spark, tmp_path
):
    """Two writers on the SAME root (a shared conf shard_root): the
    pid-suffixed manifest tmp means each os.replace publishes one
    writer's complete manifest — last-writer-wins, never interleaved
    lines.  (Same-process threads share a pid, so simulate the second
    writer's tmp isolation by running the writes sequentially and
    asserting the commit is all-or-nothing and re-runs are
    idempotent.)"""
    df = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2}") for i in range(20)],
        "doc_id long, text string",
    )
    toks = tokenize_ids(df, "doc_id", "text", vocab_size=1000).withColumn(
        "shard", (F.col("doc_id") % 2).cast("string")
    ).withColumn("pack_id", F.col("doc_id"))
    root = str(tmp_path / "shared")
    write_token_shards(toks, root)
    first = read_manifest(root)
    write_token_shards(toks, root)  # overwrite in place
    assert read_manifest(root) == first
    import glob

    assert not glob.glob(os.path.join(root, "_MANIFEST.tmp*"))


def test_export_root_is_per_process_and_conf_overridable(spark, tmp_path):
    """curation_export_shards defaults its root to a pid-suffixed /tmp
    dir (two concurrent gate processes can't race) and honors
    spark.sec_edgar.shard_root when set."""
    custom = str(tmp_path / "custom_root")
    spark.conf.set("spark.sec_edgar.shard_root", custom)
    try:
        from sec_edgar_spark.queries.curation import curation_export_shards

        out = curation_export_shards(spark, SF_DIR)
        assert os.path.exists(os.path.join(custom, "sf0.001", "_MANIFEST"))
        assert out.count() > 0
    finally:
        spark.conf.unset("spark.sec_edgar.shard_root")
