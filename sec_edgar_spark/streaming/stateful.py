"""Custom stateful streaming operator: session windows via
applyInPandasWithState (SURVEY §2.9 — capability extension).

The batch twin is ``events_sessionize`` (lag→flag→cumsum, oracle-
checked).  Streaming can't window over unbounded history, so sessions
live in per-key GroupState: each micro-batch folds its events into the
open session; a session CLOSES (and is emitted) when a later event
arrives more than ``gap`` after it ends.  The still-open session stays
in state across batches.

Late-data semantics: an event arriving in a later micro-batch with an
*older* timestamp never moves the session end backwards — it folds into
the open session with ``start = min``, ``end = max`` if it overlaps the
session's gap-extended interval, and is emitted as its own singleton
closed session if it is older than ``session_start - gap`` (it could
not have extended any session we still hold).  With ``flush_idle=True``
(requires a watermark on the input) an event-time timeout emits the
open session once the watermark passes ``session_end + gap``, so the
final session per key is not held forever.

State shape per user: (session_start_us, last_ts_us, n_events).
Emitted rows: one per closed session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    flush_idle: bool = False,
) -> DataFrame:
    """events(user_id, ts) stream → closed-session stream.

    With ``flush_idle=True`` the input must carry a watermark on ``ts``
    (``events.withWatermark("ts", ...)``); idle sessions are then
    flushed by an event-time timeout at ``session_end + gap`` instead
    of waiting for the key's next event.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key

        def emit(rows):
            return pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows],
                    "session_start": [pd.Timestamp(r[1], unit="us") for r in rows],
                    "session_end": [pd.Timestamp(r[2], unit="us") for r in rows],
                    "n_events": [r[3] for r in rows],
                }
            )

        if flush_idle and state.hasTimedOut:
            # Watermark passed session_end + gap: the open session can
            # no longer be extended — emit and drop the state.
            if state.exists:
                start_us, last_us, n = state.get
                state.remove()
                yield emit([(user_id, start_us, last_us, n)])
            return

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed = []
        for pdf in pdf_iter:
            for ts in sorted(pdf["ts"]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if last_us is None:
                    start_us, last_us, n = ts_us, ts_us, 1
                elif ts_us > last_us + gap_us:
                    closed.append((user_id, start_us, last_us, n))
                    start_us, last_us, n = ts_us, ts_us, 1
                elif ts_us < start_us - gap_us:
                    # Too late to extend any session we still hold:
                    # emit it as its own (already closed) session.
                    closed.append((user_id, ts_us, ts_us, 1))
                else:
                    # In-session, possibly late: never move end backwards.
                    start_us = min(start_us, ts_us)
                    last_us = max(last_us, ts_us)
                    n += 1
        state.update((start_us, last_us, n))
        if flush_idle and last_us is not None:
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if closed:
            yield emit(closed)

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if flush_idle
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
