"""Input-bytes-derived shuffle sizing (operators/partitions.py).

VERDICT r12 #1: the BENCH_SF100 spill wall (fixed 32 partitions →
14.4×/decade) must be fixed by engine behavior, not per-run bench
conf.  These tests pin the pure sizing rule on synthetic file
layouts and the session integration contract (floor, per-dataset
max, no ratchet, operator override).
"""

from __future__ import annotations

import os

import pytest

from sec_edgar_spark.operators.partitions import (
    BYTES_PER_PARTITION_DEFAULT,
    autosize_shuffle,
    suggest_shuffle_partitions,
    table_bytes,
    _STATE_ATTR,
)

MiB = 1024 * 1024


# ---------------------------------------------------------------- pure rule


def test_small_data_clamps_to_lo():
    assert suggest_shuffle_partitions(0, lo=32) == 32
    assert suggest_shuffle_partitions(5 * MiB, lo=32) == 32


def test_power_of_two_rounding():
    # 792 MB (the sf100 documents table) at the default 6 MiB/partition
    # needs 126 → rounds to the measured BENCH_SF100 pin of 128.
    assert suggest_shuffle_partitions(792_000_000) == 128
    # just past a power of two → next one
    bpp = BYTES_PER_PARTITION_DEFAULT
    assert suggest_shuffle_partitions(129 * bpp) == 256


def test_hi_clamp_guards_runaway():
    assert suggest_shuffle_partitions(10**15, hi=4096) == 4096


def test_monotone_in_bytes():
    prev = 0
    for nbytes in [0, 1, 10 * MiB, 100 * MiB, 1000 * MiB, 10_000 * MiB]:
        cur = suggest_shuffle_partitions(nbytes)
        assert cur >= prev
        prev = cur


def test_jitter_stability():
    # power-of-two rounding: ±2% byte jitter on a dataset must not
    # flip the plan unless it crosses a power-of-two boundary
    n = 700_000_000  # mid-band (needs ~112 of the 65..128 p2 band)
    assert (
        suggest_shuffle_partitions(int(n * 0.98))
        == suggest_shuffle_partitions(int(n * 1.02))
        == 128
    )


def test_bad_bpp_raises():
    with pytest.raises(ValueError):
        suggest_shuffle_partitions(100, bytes_per_partition=0)


# ------------------------------------------------------------- table_bytes


def test_table_bytes_single_file(tmp_path):
    p = tmp_path / "t.parquet"
    p.write_bytes(b"x" * 1234)
    assert table_bytes(str(p)) == 1234


def test_table_bytes_directory_of_parts(tmp_path):
    d = tmp_path / "t.parquet"
    d.mkdir()
    for i, sz in enumerate([100, 200, 300]):
        (d / f"part-{i}.parquet").write_bytes(b"x" * sz)
    assert table_bytes(str(d)) == 600


def test_table_bytes_missing_path_is_zero(tmp_path):
    assert table_bytes(str(tmp_path / "nope.parquet")) == 0


# ------------------------------------------------------- session contract


def _fake_dataset(tmp_path, name, nbytes):
    # Sparse file: the sizing rule only reads st_size, and materializing
    # the bytes made the two 1 GB fixtures the suite's #3/#5 slowest
    # tests (177 s + 112 s of disk writes for a size-stat check).
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    p = d / "events.parquet"
    with open(p, "wb") as fh:
        if nbytes:
            fh.seek(nbytes - 1)
            fh.write(b"\0")
    return str(d)


def _reset(spark):
    if hasattr(spark, _STATE_ATTR):
        delattr(spark, _STATE_ATTR)


def test_floor_is_session_value_and_big_data_raises(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE", raising=False)
    _reset(spark)
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        small = _fake_dataset(tmp_path, "small", 10)
        eff = autosize_shuffle(
            spark, small, table_path=os.path.join(small, "events.parquet")
        )
        assert eff == base  # small table never lowers or raises the floor
        # a "big" table: 1000 bytes at 10 bytes/partition → 100 → 128
        big = _fake_dataset(tmp_path, "big", 1000)
        eff = autosize_shuffle(
            spark,
            big,
            table_path=os.path.join(big, "events.parquet"),
            bytes_per_partition=10,
        )
        assert eff == max(base, 128)
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == eff
        # switching back to the small dataset re-sizes DOWN (no ratchet)
        eff = autosize_shuffle(
            spark, small, table_path=os.path.join(small, "events.parquet")
        )
        assert eff == base
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == base
    finally:
        _reset(spark)
        spark.conf.set("spark.sql.shuffle.partitions", str(base))


def test_dataset_effective_is_max_over_touched_tables(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE", raising=False)
    _reset(spark)
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        d = tmp_path / "ds"
        d.mkdir()
        (d / "small.parquet").write_bytes(b"x" * 10)
        (d / "large.parquet").write_bytes(b"x" * 5000)
        eff1 = autosize_shuffle(
            spark, str(d), table_path=str(d / "large.parquet"),
            bytes_per_partition=10,
        )
        assert eff1 == max(base, 512)
        # touching the small table afterwards keeps the dataset max:
        # a query is sized by the largest table it reads
        eff2 = autosize_shuffle(
            spark, str(d), table_path=str(d / "small.parquet"),
            bytes_per_partition=10,
        )
        assert eff2 == eff1
    finally:
        _reset(spark)
        spark.conf.set("spark.sql.shuffle.partitions", str(base))


def test_env_pin_disables(spark, tmp_path, monkeypatch):
    _reset(spark)
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "32")
    try:
        big = _fake_dataset(tmp_path, "pinned", 10**9)
        assert autosize_shuffle(
            spark, big, table_path=os.path.join(big, "events.parquet")
        ) is None
    finally:
        _reset(spark)


def test_conf_disables(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE", raising=False)
    _reset(spark)
    spark.conf.set("spark.sec_edgar.autosize_shuffle", "false")
    try:
        big = _fake_dataset(tmp_path, "off", 10**9)
        assert autosize_shuffle(
            spark, big, table_path=os.path.join(big, "events.parquet")
        ) is None
    finally:
        spark.conf.unset("spark.sec_edgar.autosize_shuffle")
        _reset(spark)


def test_catalog_wires_autosize(spark, monkeypatch):
    """catalog.table() feeds the scan into the autosizer: gate-scale
    data stays at the session floor (the r12 'gate bench within noise'
    criterion is this property)."""
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE", raising=False)
    _reset(spark)
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        from sec_edgar_spark import catalog

        sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
        if not os.path.exists(sf):
            pytest.skip("driver testdata not present")
        catalog.table(spark, sf, "events")
        state = getattr(spark, _STATE_ATTR)
        assert sf in state["sugg"]  # the scan was sized
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == base
    finally:
        _reset(spark)
        spark.conf.set("spark.sql.shuffle.partitions", str(base))
