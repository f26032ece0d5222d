"""Stateful streaming funnel: view→purchase conversion within a
horizon, as per-key GroupState (SURVEY §2.9 capability extension).

The batch twin is ``events_funnel_conversion`` (min-over-following
window, oracle-checked).  Streaming can't look at "the following
events", so each user's pending views live in GroupState until a
purchase arrives (every pending view with ``view_ts <= purchase_ts <=
view_ts + horizon`` emits ``converted=true``) or the event-time
timeout fires after the watermark passes ``view_ts + horizon`` (the
view can no longer convert — emitted ``converted=false``).

State shape per user: the list of pending view timestamps (bounded by
rate × horizon, the same bound as any watermarked stream join).
Emitted rows: exactly one per view event, append mode.

Caveat vs batch: the batch twin orders purchases *strictly after* the
view row (window frame ``1 FOLLOWING``); here a purchase with ts equal
to a view's ts converts it unless it arrived in an earlier batch —
equal-timestamp-cross-batch races are resolved in arrival order, the
usual streaming relaxation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("view_ts", TimestampType()),
        StructField("converted", BooleanType()),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [StructField("pending_us", ArrayType(LongType()))]
)


def funnel_stream(events: DataFrame, horizon_seconds: int = 3600) -> DataFrame:
    """events(user_id, ts, event_type) stream (watermarked on ts) →
    one row per 'view' with its conversion verdict."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hor_us = horizon_seconds * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key

        def emit(rows):
            return pd.DataFrame(
                {
                    "user_id": [user_id] * len(rows),
                    "view_ts": [pd.Timestamp(t, unit="us") for t, _ in rows],
                    "converted": [c for _, c in rows],
                }
            )

        pending: list[int] = []
        if state.exists:
            (pending_arr,) = state.get
            pending = list(pending_arr or [])

        if state.hasTimedOut:
            # Watermark passed every held view's horizon that set this
            # timeout; expire the ones that can no longer convert.
            wm_ms = state.getCurrentWatermarkMs()
            expired = [t for t in pending if t + hor_us <= wm_ms * 1000]
            pending = [t for t in pending if t + hor_us > wm_ms * 1000]
            if pending:
                state.update((pending,))
                # Clamp: floor-division of a sub-ms view ts can land the
                # deadline exactly ON the watermark, and EventTimeTimeout
                # requires timeout > watermark.
                state.setTimeoutTimestamp(
                    max(min(pending) // 1000 + horizon_seconds * 1000, wm_ms + 1)
                )
            else:
                state.remove()
            if expired:
                yield emit([(t, False) for t in sorted(expired)])
            return

        out = []
        rows = []
        for pdf in pdf_iter:
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                rows.append((int(pd.Timestamp(ts).value // 1000), et))
        rows.sort()
        for ts_us, et in rows:
            if et == "view":
                pending.append(ts_us)
            elif et == "purchase":
                hit = [t for t in pending if t <= ts_us <= t + hor_us]
                if hit:
                    pending = [t for t in pending if t not in hit]
                    out.extend((t, True) for t in sorted(hit))
        # A late view whose whole horizon is already behind the watermark
        # can never convert (matching purchases would have been dropped):
        # expire it inline instead of registering a timeout at-or-behind
        # the watermark, which EventTimeTimeout rejects
        # (IllegalArgumentException: timeout must exceed watermark).
        wm_ms = state.getCurrentWatermarkMs()
        dead = [t for t in pending if t + hor_us <= wm_ms * 1000]
        if dead:
            pending = [t for t in pending if t + hor_us > wm_ms * 1000]
            out.extend((t, False) for t in sorted(dead))
        if pending:
            state.update((pending,))
            state.setTimeoutTimestamp(
                max(min(pending) // 1000 + horizon_seconds * 1000, wm_ms + 1)
            )
        elif state.exists:
            state.remove()
        if out:
            yield emit(out)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
