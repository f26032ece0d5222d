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
