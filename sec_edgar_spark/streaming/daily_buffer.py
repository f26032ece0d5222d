"""Shared per-key trailing-buffer state machine for the stateful
daily-fold streams (ewma_stream, cusum_stream).

Both detectors keep the identical state discipline — the buffer of a
key's last <= FOLD_DAYS OBSERVED (day, count) pairs, mirroring the
batch queries' row_number-over-day-desc cap — and differ only in what
they compute from the buffer.  This module owns the discipline ONCE:

- per-batch observations are sorted by day and merged in order;
- a day at or before the key's last folded day is ignored (replay
  tolerance — the daily-delta contract);
- the buffer truncates to the newest FOLD_DAYS entries;
- a timed-out key (empty batch iterator) re-emits its current state
  unchanged instead of crashing (unreachable under NoTimeout, a hard
  crash if a timeout is ever configured).

The detector supplies only ``emit(key, days, cnts) -> pd.DataFrame``
and its output schema; a fix to the merge/replay/truncation logic
lands in both streams by construction.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

FOLD_DAYS = 90

BUFFER_STATE_SCHEMA = StructType(
    [
        StructField("days", ArrayType(LongType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)


def buffered_daily_stream(
    daily: DataFrame,
    emit: Callable,
    output_schema: StructType,
    key_col: str = "user_id",
    fold_days: int = FOLD_DAYS,
) -> DataFrame:
    """daily(key, day_epoch: long, cnt: long) stream → one
    ``emit(key, days, cnts)`` row-frame per key per batch, with the
    trailing-buffer discipline described in the module docstring."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout  # noqa: F401

    def fn(key, pdf_iter, state: GroupState):
        (key_val,) = key
        if state.exists:
            days, cnts = state.get
            days, cnts = list(days), list(cnts)
        else:
            days, cnts = [], []
        rows = []
        for pdf in pdf_iter:
            rows.append(pdf[["day_epoch", "cnt"]])
        if not rows:
            state.update((days, cnts))
            yield emit(key_val, days, cnts)
            return
        last_day = days[-1] if days else -1
        obs = pd.concat(rows).sort_values("day_epoch")
        for day, cnt in zip(obs["day_epoch"], obs["cnt"]):
            if day <= last_day:
                continue  # replayed/duplicate day — already folded
            days.append(int(day))
            cnts.append(int(cnt))
            last_day = int(day)
        if len(days) > fold_days:
            days = days[-fold_days:]
            cnts = cnts[-fold_days:]
        state.update((days, cnts))
        yield emit(key_val, days, cnts)

    return daily.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=BUFFER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
