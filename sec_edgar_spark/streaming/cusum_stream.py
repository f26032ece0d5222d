"""Stateful streaming CUSUM — the per-key running form of
queries/scalepats.events_cusum_changepoint.

Same state discipline as ewma_stream, owned by the shared
streaming/daily_buffer.py machine: the trailing buffer of each key's
last <= 90 OBSERVED (day, count) pairs (the batch cap), merged in day
order per micro-batch, truncated to the newest 90, REFOLDED from
zero.  The refold here is mandatory, not just convenient: the batch
detector's slack and threshold are derived from the WINDOW's own
statistics (n = buffer length, s = buffer sum — C_i = max(0, C_{i-1}
+ 2·n·cnt_i - 3·s), crossing at 4·s), so every new observation
reprices every earlier step — no O(1) online update exists for the
windowed form.  The refold is <= 90 integer multiply-adds per key per
batch, and because every quantity is exact int64, streaming output
equals the batch query's BIT-FOR-BIT at any history length
(parity-tested on the real parquet and past the cap).

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
from pyspark.sql.types import LongType, StructField, StructType

from .daily_buffer import FOLD_DAYS, buffered_daily_stream  # noqa: F401

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

    return buffered_daily_stream(daily, emit, CUSUM_SCHEMA)
