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
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# Buffer discipline (merge/replay/truncate) lives in the shared
# daily_buffer machine; FOLD_DAYS re-exported from there mirrors
# queries/scalepats._EWMA_FOLD_DAYS (not imported — the streaming
# module stays importable without the batch query layer; tests pin
# the two constants equal).
from .daily_buffer import FOLD_DAYS, buffered_daily_stream  # noqa: F401

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
# (the schema itself is daily_buffer.BUFFER_STATE_SCHEMA)


def ewma_stream(daily: DataFrame, alpha_num: int = 1, alpha_den: int = 4) -> DataFrame:
    """daily(user_id, day_epoch: long, cnt: long) stream → one updated
    (user_id, n_days, ewma) row per key per batch.  ``alpha`` is the
    rational ``alpha_num/alpha_den`` (defaults 1/4 — exact binary, the
    determinism contract).  ``n_days`` reports the buffer length
    (= min(observed days, FOLD_DAYS)), matching the batch query's
    count over its capped daily frame."""
    import pandas as pd

    a = alpha_num / alpha_den
    b = 1.0 - a

    def refold(cnts: list) -> float:
        s = 0.0
        for c in cnts:
            s = s * b + float(c) * a
        return s

    def emit(user_id, days, cnts):
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "n_days": [len(days)],
                "ewma": [refold(cnts)],
            }
        )

    return buffered_daily_stream(daily, emit, EWMA_SCHEMA)
