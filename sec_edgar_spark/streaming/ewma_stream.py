"""Stateful streaming EWMA — the per-key running form of
queries/scalepats.events_ewma_smoothing's sorted fold.

Each key's state is the trailing buffer of its last <= 90 OBSERVED
(day, count) observations — the same _EWMA_FOLD_DAYS bound the batch
query applies (scalepats._capped_daily: row_number over day desc
<= 90).  Every micro-batch merges its (day, count) observations in
day order into the buffer, truncates to the newest 90, and REFOLDS
the buffer from zero with the exact-binary recurrence the batch query
uses (s <- 0.75*s + 0.25*x).  Because both sides fold the identical
<= 90-element day-ordered float sequence from the identical zero
seed, streaming and batch produce the SAME float at ANY history
length — not just histories shorter than the cap.  The refold costs
<= 90 multiply-adds per key per batch; the state is hard-bounded at
90 entries per key (the same buffer bound the batch fold's
aggregation buffer carries).

The parity test drives the real events parquet through in day-ordered
waves and compares bit-for-bit against the batch fold; a second test
drives a 120-day synthetic history to prove parity past the cap.

Contract: per-day counts must arrive complete and in day order per
key (run it downstream of a daily watermark rollup — the same
daily-delta contract as the SCD2 sink).  Out-of-order days within one
batch are sorted; a day at or before the key's last folded day is
ignored (replay tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# Mirror of queries/scalepats._EWMA_FOLD_DAYS (not imported — the
# streaming module stays importable without the batch query layer;
# tests pin the two constants equal).
FOLD_DAYS = 90

EWMA_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_days", LongType()),
        StructField("ewma", DoubleType()),
    ]
)

# STATE SCHEMA v2 (round 8): the buffer of trailing observations
# replaced v1's (last_day, n_days, ewma) scalars so the stream can
# mirror the batch 90-observed-day cap exactly.  applyInPandasWithState
# pins the state schema into the checkpoint: a query RESTARTED from a
# v1 checkpoint fails the state-store compatibility check — restart
# with a fresh checkpointLocation (the stream rebuilds each key's
# buffer from its next <=90 observed days; values converge to batch
# parity as soon as 90 days have streamed, earlier values carry only
# the 6e-12 residual of the dropped prefix).
_STATE_SCHEMA = StructType(
    [
        StructField("days", ArrayType(LongType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)


def ewma_stream(daily: DataFrame, alpha_num: int = 1, alpha_den: int = 4) -> DataFrame:
    """daily(user_id, day_epoch: long, cnt: long) stream → one updated
    (user_id, n_days, ewma) row per key per batch.  ``alpha`` is the
    rational ``alpha_num/alpha_den`` (defaults 1/4 — exact binary, the
    determinism contract).  ``n_days`` reports the buffer length
    (= min(observed days, FOLD_DAYS)), matching the batch query's
    count over its capped daily frame."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    a = alpha_num / alpha_den
    b = 1.0 - a

    def refold(days: list, cnts: list) -> float:
        s = 0.0
        for c in cnts:
            s = s * b + float(c) * a
        return s

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
            # Timed-out key (empty batch iterator): pd.concat([])
            # raises, so emit the current state unchanged instead of
            # crashing the query.  Unreachable under NoTimeout but a
            # hard crash if a timeout is ever configured.
            state.update((days, cnts))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_days": [len(days)],
                    "ewma": [refold(days, cnts)],
                }
            )
            return
        last_day = days[-1] if days else -1
        obs = pd.concat(rows).sort_values("day_epoch")
        for day, cnt in zip(obs["day_epoch"], obs["cnt"]):
            if day <= last_day:
                continue  # replayed/duplicate day — already folded
            days.append(int(day))
            cnts.append(int(cnt))
            last_day = int(day)
        # Hard buffer bound: keep only the newest FOLD_DAYS
        # observations — the batch cap, mirrored.
        if len(days) > FOLD_DAYS:
            days = days[-FOLD_DAYS:]
            cnts = cnts[-FOLD_DAYS:]
        state.update((days, cnts))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_days": [len(days)],
                "ewma": [refold(days, cnts)],
            }
        )

    return daily.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=EWMA_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
