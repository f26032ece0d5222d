"""Type-2 slowly-changing-dimension build + incremental merge.

``scd2_build`` turns a change-event log into [valid_from, valid_to)
interval rows (one window, per-key partitioned).  ``scd2_merge``
absorbs a strictly-newer delta into an existing dimension without
rebuilding: the 100 TB property is that the merge's shuffles touch
only the delta and the affected keys' CURRENT rows — the closed
history (the overwhelming bulk of a years-old dimension) streams
through untouched, so a daily maintenance job costs O(|delta|), not
O(|history|).

Invariant proved by the gate (queries/scalepats.events_scd2_merge) and
tests/test_scd.py: for any split of the log at a global timestamp T,
``scd2_merge(scd2_build(log < T), log >= T) == scd2_build(log)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast

COLS = ["user_id", "status", "valid_from", "valid_to", "is_current"]


def scd2_build(events: DataFrame, bucket_s: int | None = None) -> DataFrame:
    """events(user_id, event_type, ts, event_id) → SCD2 rows.  The
    (ts, event_id) compound ordering makes LEAD deterministic under
    timestamp ties.

    ``bucket_s`` selects the SALTED LEAD
    (operators/relational.salted_next: per-(user, bucket) windows + a
    bucket-summary carry — bit-equal, no task owns a hot user's whole
    change log).  ``None`` keeps the classic single window — right for
    micro-batch deltas (scd2_merge), whose per-key frames are
    batch-sized."""
    if bucket_s is None:
        _W = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return events.select(
            "user_id",
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(_W).alias("valid_to"),
            F.lead("ts").over(_W).isNull().alias("is_current"),
        )
    from .relational import salted_next

    nxt = salted_next(
        events.select("user_id", "event_type", "ts", "event_id"),
        key_cols="user_id",
        ts_col="ts",
        tiebreak_cols=["event_id"],
        payload_cols=["ts"],
        out_prefix="_next_",
        bucket_s=bucket_s,
    )
    return nxt.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.col("_next_ts").alias("valid_to"),
        F.col("_next_ts").isNull().alias("is_current"),
    )


def scd2_merge(dim: DataFrame, updates: DataFrame) -> DataFrame:
    """Merge a delta of change events into an existing SCD2 dimension.

    Precondition: every update is strictly newer than every dim event
    for its key (the daily-delta contract).  Shapes:

    - keys absent from the delta: ALL their rows pass through without
      joining on anything (an anti-join on the broadcast key set);
    - affected keys' closed rows pass through unchanged;
    - affected keys' current row closes at the key's first delta
      timestamp;
    - the delta itself becomes fresh interval rows via the same
      windowed build.

    The only shuffles are the delta's window and the (broadcastable)
    first-update-per-key join; history never re-sorts.
    """
    first_new = updates.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    untouched = dim.join(broadcast(first_new), "user_id", "anti").select(*COLS)
    affected = dim.join(broadcast(first_new), "user_id")
    kept_closed = affected.filter(~F.col("is_current")).select(*COLS)
    closed_now = affected.filter(F.col("is_current")).select(
        "user_id",
        "status",
        "valid_from",
        F.col("first_ts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    fresh = scd2_build(updates)
    return untouched.unionByName(kept_closed).unionByName(
        closed_now
    ).unionByName(fresh)
