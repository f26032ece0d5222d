"""Batch-id idempotency marker for foreachBatch sinks.

Structured Streaming's foreachBatch delivers at-least-once: after a
crash the last micro-batch replays with the SAME batch_id.  A sink
that persists the last-processed id (atomically, AFTER its writes
land) and skips ids <= last upgrades itself to exactly-once — the
same contract Spark's own file sinks implement via their commit log.
Shared by scd_stream and incremental_lsh.
"""

from __future__ import annotations

import os

_BATCH_MARKER = "_last_batch_id"


def last_batch_id(root: str) -> int | None:
    try:
        with open(os.path.join(root, _BATCH_MARKER)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def write_batch_marker(root: str, batch_id: int) -> None:
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f".{_BATCH_MARKER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(batch_id))
    os.replace(tmp, os.path.join(root, _BATCH_MARKER))


def already_processed(root: str, batch_id: int | None) -> bool:
    """True iff this batch id was already committed (a replay)."""
    if batch_id is None:
        return False
    last = last_batch_id(root)
    return last is not None and batch_id <= last
