"""transformWithState first-N-per-key (streaming L1 dual).

The transformWithState runtime speaks protobuf to its Python state
server; this container ships no usable google.protobuf (re-verified
rounds 7, 10, 11, 13: ``import google`` -> ModuleNotFoundError — the
package is absent entirely; earlier rounds had it present but missing
the descriptor module), so the end-to-end test auto-skips where the
dependency is unusable and runs wherever protobuf is intact.
applyInPandasWithState (streaming/stateful.py, ewma_stream.py) covers
the same semantics on the non-protobuf path.
"""

import json

import pytest

from sec_edgar_spark.streaming.first_n import first_n_per_key


def _protobuf_usable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


needs_protobuf = pytest.mark.skipif(
    not _protobuf_usable(),
    reason="google.protobuf unusable here; transformWithState needs it",
)


@needs_protobuf
@pytest.mark.timeout(300)
def test_first_n_per_key_across_batches(spark, tmp_path):
    feed = tmp_path / "filings_feed"
    feed.mkdir()

    def write_batch(name, rows):
        with open(feed / name, "w") as f:
            for cik, acc in rows:
                f.write(json.dumps({"cik": cik, "accession": acc}) + "\n")

    write_batch("b1.json", [(1, "a1"), (1, "a2"), (2, "b1")])

    # transformWithState requires the RocksDB state store provider.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = spark.readStream.schema("cik long, accession string").json(str(feed))
    q = (
        first_n_per_key("cik", stream, n=3)
        .writeStream.format("memory")
        .queryName("t_first_n")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: cik 1 already has 2; only one more passes, rest drop.
        write_batch("b2.json", [(1, "a3"), (1, "a4"), (1, "a5"), (2, "b2")])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_first_n").collect()
    finally:
        q.stop()

    per_key = {}
    for r in rows:
        per_key.setdefault(r.cik, []).append(r.accession)
    assert sorted(per_key[1]) == ["a1", "a2", "a3"]
    assert sorted(per_key[2]) == ["b1", "b2"]


def test_first_n_plan_builds(spark, tmp_path):
    # Plan construction needs no protobuf — runs everywhere.
    feed = tmp_path / "plan_feed"
    feed.mkdir()
    stream = spark.readStream.schema("cik long, accession string").json(str(feed))
    out = first_n_per_key("cik", stream, n=5)
    assert out.isStreaming
    assert out.columns == ["cik", "accession"]
