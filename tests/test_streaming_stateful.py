"""applyInPandasWithState sessionization: state survives micro-batches."""

import json

import pytest

from sec_edgar_spark.streaming.stateful import sessionize_stream


@pytest.mark.timeout(240)
def test_stateful_sessions_across_batches(spark, tmp_path):
    feed = tmp_path / "events"
    feed.mkdir()

    def write_batch(name, rows):
        with open(feed / name, "w") as f:
            for user_id, ts in rows:
                f.write(json.dumps({"user_id": user_id, "ts": ts}) + "\n")

    write_batch(
        "b1.json",
        [(1, "2024-01-01T10:00:00"), (1, "2024-01-01T10:10:00"),
         (2, "2024-01-01T09:00:00")],
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .json(str(feed))
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # no session closed yet — both users have one open session
        assert spark.sql("SELECT * FROM t_sessions").count() == 0

        # batch 2: user 1 returns 2h later -> closes the first session
        write_batch("b2.json", [(1, "2024-01-01T12:30:00")])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_sessions").collect()
        assert len(rows) == 1
        s = rows[0]
        assert s.user_id == 1
        assert s.n_events == 2
        assert str(s.session_start).startswith("2024-01-01 10:00:00")
        assert str(s.session_end).startswith("2024-01-01 10:10:00")
    finally:
        q.stop()


@pytest.mark.timeout(240)
def test_stateful_sessions_late_event_never_moves_end_backwards(spark, tmp_path):
    feed = tmp_path / "events_late"
    feed.mkdir()

    def write_batch(name, rows):
        with open(feed / name, "w") as f:
            for user_id, ts in rows:
                f.write(json.dumps({"user_id": user_id, "ts": ts}) + "\n")

    write_batch("b1.json", [(1, "2024-01-01T10:00:00"), (1, "2024-01-01T10:20:00")])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .json(str(feed))
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("t_sessions_late")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE event (10:05, older than last_us=10:20) folds in
        # without moving the session end backwards.
        write_batch("b2.json", [(1, "2024-01-01T10:05:00")])
        q.processAllAvailable()
        # batch 3: 2h later -> closes the session; end must still be 10:20.
        write_batch("b3.json", [(1, "2024-01-01T12:30:00")])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_sessions_late").collect()
        assert len(rows) == 1
        s = rows[0]
        assert s.n_events == 3
        assert str(s.session_start).startswith("2024-01-01 10:00:00")
        assert str(s.session_end).startswith("2024-01-01 10:20:00")
    finally:
        q.stop()


@pytest.mark.timeout(240)
def test_stateful_sessions_flush_idle_on_watermark(spark, tmp_path):
    feed = tmp_path / "events_flush"
    feed.mkdir()

    def write_batch(name, rows):
        with open(feed / name, "w") as f:
            for user_id, ts in rows:
                f.write(json.dumps({"user_id": user_id, "ts": ts}) + "\n")

    write_batch("b1.json", [(1, "2024-01-01T10:00:00"), (1, "2024-01-01T10:10:00")])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .json(str(feed))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800, flush_idle=True)
        .writeStream.format("memory")
        .queryName("t_sessions_flush")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a DIFFERENT user far in the future advances the
        # watermark past user 1's session_end + gap -> user 1's open
        # session is flushed by the event-time timeout without any
        # further user-1 event.
        write_batch("b2.json", [(2, "2024-01-01T13:00:00")])
        q.processAllAvailable()
        # one more batch so the timeout (evaluated against the updated
        # watermark) fires.
        write_batch("b3.json", [(2, "2024-01-01T13:01:00")])
        q.processAllAvailable()
        rows = [
            r for r in spark.sql("SELECT * FROM t_sessions_flush").collect()
            if r.user_id == 1
        ]
        assert len(rows) == 1
        assert rows[0].n_events == 2
        assert str(rows[0].session_end).startswith("2024-01-01 10:10:00")
    finally:
        q.stop()
