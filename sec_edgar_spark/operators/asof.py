"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For each left row, attach the single right row with the greatest
``right_ts <= left_ts`` (backward; ``>=``/least for forward) sharing the
equi-key.  The classic formulations are a range join (quadratic blowup
per key) or a per-row correlated subquery (not distributed); this one is
the scale-safe union+window form:

1. tag both sides and align them into one frame,
2. ONE shuffle: window partitioned by the key, ordered by
   ``(ts, side)`` — right rows sort before left rows at equal
   timestamps for non-strict semantics, after them for strict,
3. ``last(right_payload, ignorenulls=True)`` over
   ``rows unbounded preceding .. current row`` carries the latest
   right payload onto every left row,
4. keep left rows, unpack the payload struct.

Cost is one shuffle + sort of |L|+|R| rows regardless of temporal
density — no candidate blowup, no driver loop.

Hot keys: the single-window form puts a key's ENTIRE combined stream in
one task — at 100 TB a key holding 30 % of the table is one task
holding 30 % of the table (the straggler class BENCH_SF1_SKEW.md
measured for sessionize).  ``bucket_s`` switches to the SALTED
two-level form (the fragment-merge device of operators/sessionize.py,
adapted to carry semantics):

1. bucket the time axis; window per (key, bucket) — the hot key
   spreads across ~(timespan / bucket_s) tasks.  A bucket resolves
   every left row that has an in-bucket match;
2. the only cross-bucket fact a bucket needs is "the latest right row
   of any EARLIER bucket" — one map-side-combined max per
   (key, bucket), then a per-key running carry over BUCKET SUMMARIES
   (vocabulary-shaped, thousands of times smaller than the stream);
3. each bucket's carry re-enters the window input as one SYNTHETIC
   right row sorted before the bucket's real rows, so the per-bucket
   window alone yields the final match — the big frame is never
   joined or re-sorted.

Exactness: buckets partition the time axis on exact microseconds, so
equal timestamps always share a bucket (strict/non-strict tie rules
stay purely in-bucket, decided by the side ordering), and any carried
row is STRICTLY earlier than every row of the bucket it feeds.
Bit-equal to the single-window form: tests/test_asof.py +
tests/test_asof_properties.py (adversarial + hypothesis property).

Reference parity note: the reference engine has no as-of join; this is
part of the training-data-pipeline extension family (point-in-time
feature attachment, e.g. "state of the filer as of the event").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
    suffix: str = "_right",
    bucket_s: int | None = None,
) -> DataFrame:
    """Point-in-time join; returns every left row (left-outer semantics)
    with the matched right columns renamed ``<col><suffix>`` (right_ts
    included), NULL when no right row qualifies.

    direction="backward": greatest right_ts <= left_ts (< if strict).
    direction="forward":  least right_ts >= left_ts (> if strict).
    Ties among right rows on (key, right_ts) resolve to the row ordered
    last by the remaining payload columns (deterministic).

    ``bucket_s`` (seconds) selects the salted two-level form (module
    docstring) — identical output, hot-key-safe; ``None`` keeps the
    classic single window.  Timestamps must be non-null on both sides
    (both forms; a null ts has no place on the time axis).

    NULL equi-keys follow WINDOW semantics — NULL groups like a
    regular key, so a NULL-key left row matches the latest NULL-key
    right row (both forms identical; tests/test_salted_null_keys.py).
    That deliberately DIVERGES from join-based as-of implementations
    (a SQL ASOF JOIN treats NULL as no-match), which is why the
    oracle-gated corpora keep join keys non-null; callers wanting
    join semantics filter NULL keys upstream.
    """
    if isinstance(on, str):
        on = [on]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if bucket_s is not None and bucket_s < 1:
        raise ValueError(f"bucket_s must be >= 1 or None, got {bucket_s}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]
    payload = [c for c in right_cols if c != right_ts] + [right_ts]

    # side ordering at equal ts: non-strict → right first (a right row AT
    # left_ts is eligible); strict → right last (not yet visible).
    right_side = 0 if not strict else 2
    l2 = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            "struct<" + ", ".join(f"{c}: {right.schema[c].dataType.simpleString()}" for c in payload) + ">"
        ).alias("_rrow"),
    )
    r2 = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        F.lit(None).cast(l2.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*[F.col(c) for c in payload]).alias("_rrow"),
    )
    u = l2.unionByName(r2)

    if bucket_s is None:
        ts_order = (
            F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
        )
        w = (
            Window.partitionBy(*on)
            .orderBy(ts_order, F.col("_side").asc(), F.col("_rrow").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = u.withColumn(
            "_match", F.last("_rrow", ignorenulls=True).over(w)
        )
        out = carried.filter(F.col("_side") == 1)
    else:
        # Salted two-level form.  One direction-normalized axis makes
        # backward the only case: _dord ascends in window order for
        # both directions (unix_micros is a lossless monotone map of
        # Spark's microsecond timestamps; negation mirrors the axis
        # for forward).  NTZ casts to TIMESTAMP under the UTC session
        # — same rule as functions/scalars.epoch_s.
        b_us = int(bucket_s) * 1_000_000
        ord_us = F.unix_micros(F.col("_ts").cast("timestamp"))
        dord = ord_us if direction == "backward" else -ord_us
        # exact long floor division (pmod is non-negative; see
        # operators/relational.salted_rank)
        bkt = ((dord - F.pmod(dord, F.lit(b_us))) / F.lit(b_us)).cast("long")
        ub = u.withColumn("_dord", dord).withColumn("_bkt", bkt)

        # per-(key, bucket) summary: the right row a LATER bucket would
        # inherit = max by (_dord, _rrow) over the bucket's right rows
        # (max of a struct is lexicographic — exactly the window
        # order's last; non-right rows contribute NULL and max ignores
        # them).  Map-side combined: the shuffle moves one row per
        # (key, bucket), never the stream.
        cells = ub.groupBy(*on, "_bkt").agg(
            F.max(
                F.when(F.col("_side") != 1, F.struct("_dord", "_rrow"))
            ).alias("_best")
        )
        wcarry = Window.partitionBy(*on).orderBy("_bkt").rowsBetween(
            Window.unboundedPreceding, -1
        )
        # The carry enters each bucket as a SYNTHETIC right row sorted
        # before every real row of the bucket (_dord = bucket start ≤
        # all real _dord there; _side = -1 beats every real side), so
        # the local window alone produces the final match — no join
        # back onto the |L|+|R| frame (which would re-sort it).  The
        # union adds ≤ 1 summary-sized row per (key, bucket).
        carry_rows = (
            cells.withColumn(
                "_cr", F.last("_best", ignorenulls=True).over(wcarry)
            )
            .filter(F.col("_cr").isNotNull())
            .select(
                *on,
                F.lit(None).cast(l2.schema["_ts"].dataType).alias("_ts"),
                F.lit(-1).alias("_side"),
                F.lit(None).cast(l2.schema["_lrow"].dataType).alias("_lrow"),
                F.col("_cr._rrow").alias("_rrow"),
                (F.col("_bkt") * b_us).alias("_dord"),
                F.col("_bkt"),
            )
        )

        wl = (
            Window.partitionBy(*on, "_bkt")
            .orderBy(F.col("_dord").asc(), F.col("_side").asc(), F.col("_rrow").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = (
            ub.unionByName(carry_rows)
            .withColumn("_match", F.last("_rrow", ignorenulls=True).over(wl))
            .filter(F.col("_side") == 1)
        )
    left_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    match_cols = [F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in payload]
    return out.select(*left_cols, *match_cols)
