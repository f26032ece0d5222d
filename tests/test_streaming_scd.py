"""Streaming SCD2 maintenance: closed ∪ current after ordered waves of
the real events parquet equals the one-shot batch build; the closed
store is append-only (no rewrite amplification)."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_scd2_stream_matches_batch_build(spark, tmp_path):
    from sec_edgar_spark.operators.scd import scd2_build
    from sec_edgar_spark.streaming.scd_stream import (
        read_dim,
        run_scd2_maintenance,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    feed = tmp_path / "feed"
    root = str(tmp_path / "dim")
    # three event-time-ordered waves (the daily-delta contract)
    ev.filter(F.dayofmonth("ts") <= 10).write.parquet(str(feed / "b1"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1000")
        .parquet(str(feed) + "/*")
    )
    q = run_scd2_maintenance(
        stream, root, checkpoint=str(tmp_path / "ckpt"), query_name="t_scd2"
    )
    try:
        q.processAllAvailable()
        ev.filter(
            (F.dayofmonth("ts") > 10) & (F.dayofmonth("ts") <= 20)
        ).write.parquet(str(feed / "b2"))
        q.processAllAvailable()
        ev.filter(F.dayofmonth("ts") > 20).write.parquet(str(feed / "b3"))
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    got = {
        (r.user_id, r.status, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in read_dim(spark, root).collect()
    }
    want = {
        (r.user_id, r.status, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in scd2_build(ev).collect()
    }
    assert got == want
    # exactly one current row per user
    cur = spark.read.parquet(f"{root}/current")
    n_users = ev.select("user_id").distinct().count()
    assert cur.count() == n_users
    assert cur.filter(~F.col("is_current")).count() == 0


def _dim_snapshot(spark, root):
    from sec_edgar_spark.streaming.scd_stream import read_dim

    return sorted(
        (r.user_id, r.status, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in read_dim(spark, root).collect()
    )


def test_upsert_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed (batch_id, delta) after
    a crash must be a no-op — no re-appended closed rows, no re-merge
    of a delta against an already-advanced snapshot (which would
    violate scd2_merge's strictly-newer precondition and corrupt
    intervals).  ADVICE r5 medium."""
    import datetime as dt

    from sec_edgar_spark.streaming.scd_stream import scd2_upsert_batch

    root = str(tmp_path / "dim")
    schema = (
        "user_id long, event_type string, ts timestamp, event_id long"
    )

    def batch(rows):
        return spark.createDataFrame(
            [
                (u, s, dt.datetime(2024, 1, d, h), eid)
                for (u, s, d, h, eid) in rows
            ],
            schema,
        )

    b0 = batch([(1, "free", 1, 0, 1), (2, "free", 1, 0, 2)])
    b1 = batch([(1, "paid", 2, 0, 3), (2, "trial", 2, 0, 4)])
    scd2_upsert_batch(spark, root, b0, batch_id=0)
    scd2_upsert_batch(spark, root, b1, batch_id=1)
    snap = _dim_snapshot(spark, root)
    # replay the last batch (same id) — must change nothing
    scd2_upsert_batch(spark, root, b1, batch_id=1)
    assert _dim_snapshot(spark, root) == snap
    # replay an even older batch — also a no-op
    scd2_upsert_batch(spark, root, b0, batch_id=0)
    assert _dim_snapshot(spark, root) == snap
    # a genuinely new batch still applies
    b2 = batch([(1, "churned", 3, 0, 5)])
    scd2_upsert_batch(spark, root, b2, batch_id=2)
    after = _dim_snapshot(spark, root)
    assert after != snap
    # interval sanity: no corrupt rows (valid_to < valid_from), exactly
    # one current row per key
    from sec_edgar_spark.streaming.scd_stream import read_dim

    dim = read_dim(spark, root)
    assert (
        dim.filter(F.col("valid_to") < F.col("valid_from")).count() == 0
    )
    assert (
        dim.filter(F.col("is_current")).groupBy("user_id").count()
        .filter(F.col("count") > 1).count() == 0
    )


def test_replay_after_writes_but_before_marker_is_noop(spark, tmp_path):
    """The marker-less crash window (code review r6): both parquet
    writes landed but the marker didn't.  The replayed batch passes the
    already_processed check, so idempotence must come from the
    strictly-newer filter — without it the re-merge would close rows at
    a first_ts EARLIER than the advanced valid_from (negative
    intervals)."""
    import datetime as dt
    import os

    from sec_edgar_spark.streaming.scd_stream import scd2_upsert_batch

    root = str(tmp_path / "dim3")
    schema = "user_id long, event_type string, ts timestamp, event_id long"
    b0 = spark.createDataFrame(
        [(1, "free", dt.datetime(2024, 1, 1), 1)], schema
    )
    b1 = spark.createDataFrame(
        [
            (1, "trial", dt.datetime(2024, 1, 2), 2),
            (1, "paid", dt.datetime(2024, 1, 3), 3),
        ],
        schema,
    )
    scd2_upsert_batch(spark, root, b0, batch_id=0)
    scd2_upsert_batch(spark, root, b1, batch_id=1)
    snap = _dim_snapshot(spark, root)
    # simulate the crash window: writes committed, marker lost
    os.remove(os.path.join(root, "_last_batch_id"))
    scd2_upsert_batch(spark, root, b1, batch_id=1)
    assert _dim_snapshot(spark, root) == snap
    from sec_edgar_spark.streaming.scd_stream import read_dim

    dim = read_dim(spark, root)
    assert (
        dim.filter(F.col("valid_to") < F.col("valid_from")).count() == 0
    )
    # marker restored by the replayed (now no-op) round
    assert os.path.exists(os.path.join(root, "_last_batch_id"))


def test_read_dim_dedups_torn_closed_append(spark, tmp_path):
    """Crash between the closed append and the current overwrite leaves
    one batch's closed rows appended twice; read_dim must first-wins
    dedup them on the full row (COLS + _emit_ord)."""
    import datetime as dt

    from sec_edgar_spark.streaming.scd_stream import (
        read_dim,
        scd2_upsert_batch,
    )

    root = str(tmp_path / "dim2")
    schema = (
        "user_id long, event_type string, ts timestamp, event_id long"
    )
    b0 = spark.createDataFrame(
        [(1, "free", dt.datetime(2024, 1, 1), 1)], schema
    )
    b1 = spark.createDataFrame(
        [(1, "paid", dt.datetime(2024, 1, 2), 2)], schema
    )
    scd2_upsert_batch(spark, root, b0, batch_id=0)
    scd2_upsert_batch(spark, root, b1, batch_id=1)
    snap = _dim_snapshot(spark, root)
    # simulate the torn write: duplicate the closed store wholesale
    closed = spark.read.parquet(f"{root}/closed")
    closed.write.mode("append").parquet(f"{root}/closed")
    assert _dim_snapshot(spark, root) == snap
