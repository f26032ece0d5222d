"""Streaming per-key count limit via ``transformWithState`` (L1/L3's
continuous form, on Spark 4's arbitrary-state API).

The batch engine's ``filings(count=n)`` keeps the newest N filings per
CIK with a WindowGroupLimit; on an unbounded stream "newest N" is
unknowable, but "FIRST N seen per key" is the streaming dual (cap
intake per company, cap documents per source in a crawl).  State is a
single counter per key — ``ValueState`` with optional TTL so abandoned
keys expire instead of accumulating forever.

This is the modern replacement for the applyInPandasWithState pattern
used in stateful.py: typed state handles, composable with timers/TTL,
and the shape Spark 4 will keep evolving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def first_n_per_key(
    grouped_key: str,
    df: DataFrame,
    n: int,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Emit only the first ``n`` rows seen per key across the stream.

    Output schema = input schema.  ``ttl_ms`` expires a key's counter
    after that idle period (unbounded keyspace hygiene at scale).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    schema = df.schema
    columns = df.columns

    class FirstN(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState(
                "count", "n BIGINT", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            seen = self._count.get()[0] if self._count.exists() else 0
            remaining = n - seen
            if remaining <= 0:
                # Drain without emitting (state already saturated).
                for _ in rows:
                    pass
                return
            taken = 0
            for pdf in rows:
                if taken >= remaining:
                    continue  # keep draining the iterator
                chunk = pdf.iloc[: remaining - taken]
                taken += len(chunk)
                if len(chunk):
                    yield chunk
            self._count.update((seen + taken,))

        def close(self) -> None:
            pass

    return df.groupBy(grouped_key).transformWithStateInPandas(
        statefulProcessor=FirstN(),
        outputStructType=schema,
        outputMode="append",
        timeMode="none",
    )
