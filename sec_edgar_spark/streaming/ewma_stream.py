"""Stateful streaming EWMA — the per-key running form of
queries/scalepats.events_ewma_smoothing's sorted fold.

Each key's state is ``(last_day_epoch, n_days, ewma)``; every
micro-batch folds its (day, count) observations in day order into the
running value with the same exact-binary recurrence the batch query
uses (s ← 0.75·s + 0.25·x), so streaming and batch produce the SAME
float for the same observation sequence — the parity test drives the
real events parquet through in day-ordered waves and compares
bit-for-bit against the batch fold.

Contract: per-day counts must arrive complete and in day order per
key (run it downstream of a daily watermark rollup — the same
daily-delta contract as the SCD2 sink).  Out-of-order days within one
batch are sorted; a day at or before the key's last folded day is
ignored (replay tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

EWMA_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_days", LongType()),
        StructField("ewma", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_day", LongType()),
        StructField("n_days", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def ewma_stream(daily: DataFrame, alpha_num: int = 1, alpha_den: int = 4) -> DataFrame:
    """daily(user_id, day_epoch: long, cnt: long) stream → one updated
    (user_id, n_days, ewma) row per key per batch.  ``alpha`` is the
    rational ``alpha_num/alpha_den`` (defaults 1/4 — exact binary, the
    determinism contract)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    a = alpha_num / alpha_den
    b = 1.0 - a

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_day, n_days, ewma = state.get
        else:
            last_day, n_days, ewma = -1, 0, 0.0
        rows = []
        for pdf in pdf_iter:
            rows.append(pdf[["day_epoch", "cnt"]])
        if not rows:
            # Timed-out key (empty batch iterator): pd.concat([])
            # raises, so emit the current state unchanged instead of
            # crashing the query.  Unreachable under NoTimeout but a
            # hard crash if a timeout is ever configured.
            state.update((last_day, n_days, ewma))
            yield pd.DataFrame(
                {"user_id": [user_id], "n_days": [n_days], "ewma": [ewma]}
            )
            return
        obs = pd.concat(rows).sort_values("day_epoch")
        for day, cnt in zip(obs["day_epoch"], obs["cnt"]):
            if day <= last_day:
                continue  # replayed/duplicate day — already folded
            ewma = ewma * b + float(cnt) * a
            last_day = int(day)
            n_days += 1
        state.update((last_day, n_days, ewma))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_days": [n_days], "ewma": [ewma]}
        )

    return daily.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=EWMA_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
