"""Stateful streaming CUSUM — the per-key running form of
queries/scalepats.events_cusum_changepoint.

Same state discipline as ewma_stream: each key holds the trailing
buffer of its last <= 90 OBSERVED (day, count) pairs (the batch cap),
merges each micro-batch's observations in day order, truncates to the
newest 90, and REFOLDS from zero.  The refold here is mandatory, not
just convenient: the batch detector's slack and threshold are derived
from the WINDOW's own statistics (n = buffer length, s = buffer sum —
C_i = max(0, C_{i-1} + 2·n·cnt_i - 3·s), crossing at 4·s), so every
new observation reprices every earlier step — no O(1) online update
exists for the windowed form.  The refold is <= 90 integer
multiply-adds per key per batch, and because every quantity is exact
int64, streaming output equals the batch query's BIT-FOR-BIT at any
history length (parity-tested on the real parquet and past the cap).

The first-crossing day is reported as days-since-epoch (long) —
states and Arrow batches stay integer-typed end to end; the batch
query's DATE column is `epoch + first_cp_day` (its no-crossing
sentinel 1970-01-01 is exactly epoch_day = 0 here).

Contract: identical to ewma_stream — per-day counts arrive complete
and in day order per key (downstream of a daily watermark rollup);
out-of-order days within one batch are sorted; a day at or before the
key's last folded day is ignored (replay tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

# Mirror of queries/scalepats._EWMA_FOLD_DAYS (pinned equal by test).
FOLD_DAYS = 90

CUSUM_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_days", LongType()),
        StructField("total", LongType()),
        StructField("n_changepoints", LongType()),
        StructField("max_cusum", LongType()),
        StructField("first_cp_day", LongType()),  # days since epoch, 0 = none
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("days", ArrayType(LongType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)


def _refold(days: list, cnts: list) -> tuple:
    """Replay the batch recurrence over the whole buffer: returns
    (n_days, total, n_changepoints, max_cusum, first_cp_day)."""
    n = len(cnts)
    s = sum(cnts)
    h = 4 * s
    c = 0
    n_cp = 0
    mx = 0
    fd = 0
    for day, cnt in zip(days, cnts):
        new_c = max(0, c + 2 * n * cnt - 3 * s)
        if c < h and new_c >= h:
            n_cp += 1
            if fd == 0:
                fd = day
        if new_c > mx:
            mx = new_c
        c = new_c
    return n, s, n_cp, mx, fd


def cusum_stream(daily: DataFrame) -> DataFrame:
    """daily(user_id, day_epoch: long, cnt: long) stream → one updated
    (user_id, n_days, total, n_changepoints, max_cusum, first_cp_day)
    row per key per batch, bit-identical to the batch detector over
    the same trailing window."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout  # noqa: F401

    def emit(user_id, days, cnts):
        n, s, n_cp, mx, fd = _refold(days, cnts)
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "n_days": [n],
                "total": [s],
                "n_changepoints": [n_cp],
                "max_cusum": [mx],
                "first_cp_day": [fd],
            }
        )

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.exists:
            days, cnts = state.get
            days, cnts = list(days), list(cnts)
        else:
            days, cnts = [], []
        rows = []
        for pdf in pdf_iter:
            rows.append(pdf[["day_epoch", "cnt"]])
        if not rows:
            # Timed-out key: emit current state unchanged (same guard
            # as ewma_stream — unreachable under NoTimeout).
            state.update((days, cnts))
            yield emit(user_id, days, cnts)
            return
        last_day = days[-1] if days else -1
        obs = pd.concat(rows).sort_values("day_epoch")
        for day, cnt in zip(obs["day_epoch"], obs["cnt"]):
            if day <= last_day:
                continue  # replayed/duplicate day — already folded
            days.append(int(day))
            cnts.append(int(cnt))
            last_day = int(day)
        if len(days) > FOLD_DAYS:
            days = days[-FOLD_DAYS:]
            cnts = cnts[-FOLD_DAYS:]
        state.update((days, cnts))
        yield emit(user_id, days, cnts)

    return daily.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
