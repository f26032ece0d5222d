"""Streaming SCD2 dimension maintenance — foreachBatch + split layout.

Keeps a Type-2 dimension continuously up to date from a change-event
stream, with per-batch cost O(|keys| + |delta|), never O(|history|):

- ``<root>/closed/``  — append-only parquet of closed interval rows.
  History is immutable: once a row has a valid_to it never changes, so
  it is appended exactly once and never rewritten.
- ``<root>/current/`` — the open row per key (one row per key, tiny
  relative to history), rewritten wholesale each batch.  Rewriting the
  current snapshot is the price of plain parquet having no MERGE; the
  snapshot is keys-sized, not history-sized, so the rewrite stays
  cheap forever (a table format with row-level merge — Delta/Iceberg —
  swaps this overwrite for a MERGE INTO with the same logic).

Each micro-batch runs the same arithmetic as the batch operator
(operators/scd.py scd2_merge): affected keys' current rows close at
the key's first delta timestamp, the delta becomes fresh interval
rows, and only the new current rows land back in ``current/``.

Contract: micro-batches must arrive in event-time order per key (the
daily-delta contract of scd2_merge); the parity test drives the real
events parquet through in ordered waves and checks
closed ∪ current == scd2_build(all events).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators._lineage import lineage_cut

from ..operators.scd import COLS, scd2_build, scd2_merge
from .exactly_once import already_processed, write_batch_marker
from .store import read_or_empty

_EMPTY_SCHEMA = (
    "user_id long, status string, valid_from timestamp, "
    "valid_to timestamp, is_current boolean"
)
# closed/ additionally carries an emit ordinal so crash-replay
# duplicates (same ordinal) are distinguishable from legitimately
# repeated bit-identical rows (distinct ordinals) — see read_dim
_CLOSED_SCHEMA = _EMPTY_SCHEMA + ", _emit_ord int"


def _read_or_empty(spark: SparkSession, path: str) -> DataFrame:
    return read_or_empty(spark, path, _EMPTY_SCHEMA)


def read_dim(spark: SparkSession, root: str) -> DataFrame:
    """The full dimension: immutable history ∪ current snapshot.

    Closed rows are deduped on the FULL row (COLS + ``_emit_ord``): a
    crash between the closed append and the current overwrite leaves
    one batch's closed rows appended twice (the replayed merge
    re-emits them bit-identically, ordinals included — ordinals are a
    deterministic multiset over bit-identical rows), so whole-row
    first-wins dedup restores exactly-once semantics on read.  The key
    is deliberately NOT (user_id, valid_from): two change events with
    the SAME timestamp for one key (the poison corpus's 50-event
    burst) legitimately produce multiple closed rows sharing
    valid_from — a natural-key dedup silently dropped the
    distinct-status ones.  The ``_emit_ord`` column (ADVICE r12)
    additionally preserves EXACT multiplicity of bit-identical
    degenerate rows (N same-type events at one timestamp → N-1
    identical zero-length intervals, ordinals 1..N-1): without it,
    dedup collapsed them to one and downstream COUNTs diverged from
    the batch twin.  Parity contract: read_dim == scd2_build EXACTLY,
    duplicates included (tests/test_streaming_poison.py pins it on
    the burst).  Cross-batch bit-identical closed rows cannot occur —
    the strictly-newer delta filter advances valid_from per key per
    batch — so a per-batch per-row-value ordinal is a global key.
    Stores written before the ordinal read it as NULL and keep the
    old collapse-to-one behavior.
    """
    closed = (
        read_or_empty(spark, f"{root}/closed", _CLOSED_SCHEMA)
        .dropDuplicates()
        .drop("_emit_ord")
    )
    return closed.unionByName(_read_or_empty(spark, f"{root}/current"))


def scd2_upsert_batch(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    batch_id: int | None = None,
) -> None:
    """One merge round: read the current snapshot, merge the delta,
    append newly-closed rows, replace the snapshot.

    Exactly-once under foreachBatch's at-least-once delivery: the
    last-processed ``batch_id`` is persisted in ``<root>/_last_batch_id``
    (written atomically AFTER both parquet writes land), and a replayed
    batch with ``batch_id <= last`` is skipped.  Without the skip, a
    crash-replay would both re-append closed rows AND re-merge a delta
    that is no longer strictly newer than the already-advanced
    ``current/`` snapshot — violating scd2_merge's precondition and
    corrupting intervals (valid_to < valid_from).  Callers outside a
    stream may omit ``batch_id`` to get plain (non-idempotent) merge.
    """
    if already_processed(root, batch_id):
        return
    # cheap idle-tick path: an empty raw batch (the steady-state
    # foreachBatch invocation) must not pay the current/ read + join
    if batch.isEmpty():
        if batch_id is not None:
            write_batch_marker(root, batch_id)
        return
    current = _read_or_empty(spark, f"{root}/current")
    # Idempotence must hold even when the crash hit AFTER the two
    # parquet writes but BEFORE the marker (the marker alone can't see
    # that window): drop delta rows that are not strictly newer than
    # the key's current open interval.  After a completed apply,
    # current.valid_from == the key's max event ts, so a replayed
    # batch filters to empty here and the round reduces to writing the
    # marker; a first apply keeps every row (the strictly-newer
    # contract).  Without this, the replayed merge would close rows at
    # a first_ts EARLIER than the advanced valid_from — negative
    # intervals.
    cur_open = current.filter(F.col("is_current")).select(
        "user_id", F.col("valid_from").alias("_cur_from")
    )
    batch = (
        batch.join(cur_open, "user_id", "left")
        .filter(
            F.col("_cur_from").isNull() | (F.col("ts") > F.col("_cur_from"))
        )
        .drop("_cur_from")
    )
    if batch.isEmpty():
        if batch_id is not None:
            write_batch_marker(root, batch_id)
        return
    merged = scd2_merge(current, batch).select(*COLS)
    # materialize: merged is consumed twice (closed + current splits)
    # and must not recompute after current/ is overwritten underneath
    # it.  local_only: this runs EVERY micro-batch — a reliable
    # checkpoint here would write a full dimension copy per batch,
    # unbounded over a stream's lifetime, and buys nothing: if executor
    # loss kills the local blocks mid-batch the batch fails and the
    # marker protocol below replays it idempotently.
    merged = merged.transform(lambda d: lineage_cut(d, local_only=True))
    # one file per append: the closed-rows delta of one micro-batch is
    # small, and per-batch multi-file appends make the store's file
    # count grow with batch count (the incremental_lsh bench measured
    # the re-read creep that causes); current/ is a full overwrite and
    # key-bounded, so it keeps natural parallelism
    # _emit_ord: row_number over bit-identical rows — deterministic as
    # a multiset across crash-replay (the re-merge re-emits the same
    # rows, so {(row, 1..N)} reproduces exactly), while giving
    # legitimately repeated degenerate rows distinct identities so
    # read_dim's exactly-once dedup keeps their full multiplicity
    from pyspark.sql.window import Window as _W

    merged.filter(~F.col("is_current")).withColumn(
        "_emit_ord",
        F.row_number().over(_W.partitionBy(*COLS).orderBy(F.lit(1))),
    ).coalesce(1).write.mode("append").parquet(f"{root}/closed")
    merged.filter(F.col("is_current")).write.mode("overwrite").parquet(
        f"{root}/current"
    )
    if batch_id is not None:
        # Marker lands last; every earlier crash point is covered:
        # before the closed append -> replay is a clean first apply;
        # between the writes -> replay re-merges against the OLD
        # current (untouched) and re-appends identical closed rows
        # (ordinals included), which read_dim's whole-row dedup
        # absorbs; after
        # both writes -> the strictly-newer filter above empties the
        # replayed delta and only the marker is (re)written.
        write_batch_marker(root, batch_id)


def run_scd2_maintenance(
    events: DataFrame,
    root: str,
    checkpoint: str,
    query_name: str = "scd2_maintenance",
):
    """Wire a streaming events frame (user_id, event_type, ts,
    event_id) into the split-layout SCD2 store via foreachBatch."""
    spark = events.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        scd2_upsert_batch(spark, root, batch_df, batch_id=batch_id)

    return (
        events.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )
