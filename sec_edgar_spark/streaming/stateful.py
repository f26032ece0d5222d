"""Custom stateful streaming operator: session windows via
applyInPandasWithState (SURVEY §2.9 — capability extension).

The batch twin is ``events_sessionize`` (lag→flag→cumsum, oracle-
checked).  Streaming can't window over unbounded history, so sessions
live in per-key GroupState: each micro-batch folds its events into the
open session; a session CLOSES (and is emitted) when a later event
arrives more than ``gap`` after it ends.  The still-open session stays
in state across batches.

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
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """events(user_id, ts) stream → closed-session stream."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
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
                elif ts_us - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n))
                    start_us, last_us, n = ts_us, ts_us, 1
                else:
                    last_us = ts_us
                    n += 1
        state.update((start_us, last_us, n))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
