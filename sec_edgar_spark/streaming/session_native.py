"""Native session windows: ``F.session_window`` — the JVM-side twin of
the Python-state sessionizer in ``streaming/stateful.py``.

Spark's built-in session window keeps ALL state in the JVM state store
(no Python workers, no Arrow hop) and merges windows that fall within
``gap`` of each other; a window closes — and, in append mode, emits —
once the watermark passes its end.  This is the idiomatic Spark answer
for session rollups; ``stateful.py`` remains the escape hatch for
custom fold semantics the built-in can't express (e.g. its
min/max late-event folding rules).

Semantics pin (both engines, both modes): a session's end is
``last event ts + gap`` (end-exclusive), so an event exactly ``gap``
after the previous one starts a NEW session.  The batch twin
(``queries/scalepats.events_session_native``) oracle-checks exactly
that boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_rollup(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """(user_id, session_start, session_end, n_events) — works
    identically on a batch DataFrame and a watermarked stream (the
    caller applies ``withWatermark`` before this for streaming)."""
    return (
        events.groupBy(
            "user_id",
            F.session_window("ts", f"{gap_seconds} seconds").alias("w"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory_sink(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
    query_name: str = "session_native",
):
    """Wire a streaming events frame through the native session window
    into a complete-unsupported/append-supported memory sink.  Session
    windows require update or append with watermark; append emits only
    watermark-closed sessions, which is the production contract."""
    rolled = session_rollup(
        events.withWatermark("ts", watermark), gap_seconds
    )
    return (
        rolled.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
