"""Adversarial single-key probe for the per-key sorted folds
(VERDICT r6 #5): one bot user owns 50% of all events, with YEARS of
daily history and one never-ending session — the pathology the
_EWMA_FOLD_DAYS window and the top-paths 64-row pre-filter exist for.

Two fold families are probed, each capped-vs-uncapped:

- EWMA daily fold (events_ewma_smoothing shape): the bot has 1200
  active days; uncapped collects a 1200-element array in one
  aggregation buffer, capped collects <= 90 (trailing window filter
  runs BEFORE the collect).
- top-paths session fold (events_top_paths shape): the bot emits an
  event every minute forever, so the 30-min sessionizer never cuts —
  one session holds N/2 rows.  Uncapped collect_list builds that
  whole array in a single buffer; the row_number pre-filter caps it
  at 64 rows before the collect.

Reported: wall time of each variant and the MAX COLLECTED ARRAY SIZE
(the buffer-bound being asserted — deterministic, unlike wall time).

Usage: python tools/fold_skew_probe.py [n_rows]   (default 2_000_000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

BOT = 0
N_USERS = 50_000
BOT_DAYS = 1200


def build_daily(spark, n_rows: int):
    """(user_id, day, cnt) frame: bot holds 50% of rows over BOT_DAYS
    distinct days; normal users get ~30 days each."""
    base = F.lit("2020-01-01").cast("date")
    return (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(BOT))
            .otherwise(1 + F.pmod(F.xxhash64("id"), F.lit(N_USERS)))
            .alias("user_id"),
            F.when(
                F.col("id") % 2 == 0,
                F.pmod(F.col("id") / 2, F.lit(BOT_DAYS)),
            )
            .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(30)))
            .cast("int")
            .alias("day_off"),
        )
        .select("user_id", F.date_add(base, F.col("day_off")).alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count("*").alias("cnt"))
    )


def build_session_rows(spark, n_rows: int):
    """(user_id, sid, ts, event_id, event_type): bot rows all in one
    session (sid 0), normal users in short sessions."""
    return spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(BOT))
        .otherwise(1 + F.pmod(F.xxhash64("id"), F.lit(N_USERS)))
        .alias("user_id"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)))
        .cast("bigint")
        .alias("sid"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("event_id"),
        F.concat(F.lit("e"), F.pmod(F.col("id"), F.lit(5))).alias(
            "event_type"
        ),
    )


def timed(df) -> float:
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    return time.time() - t0


def ewma_fold(daily):
    return daily.groupBy("user_id").agg(
        F.count("*").alias("n_days"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "cnt"))),
                lambda s: s["cnt"].cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc * 0.75 + x * 0.25,
        ).alias("ewma"),
    )


def path_fold(rows):
    return (
        rows.groupBy("user_id", "sid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("steps")
        )
        .select(
            "user_id",
            F.size("steps").alias("n_steps"),
            F.array_join(
                F.transform("steps", lambda s: s["event_type"]), ">"
            ).alias("path"),
        )
    )


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from sec_edgar_spark.session import get_spark
    from sec_edgar_spark.queries.scalepats import _EWMA_FOLD_DAYS

    spark = get_spark(app_name="fold-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"== fold skew probe: {n_rows:,} rows, bot={BOT} holds 50% ==")

    daily = build_daily(spark, n_rows).localCheckpoint()
    t_un = timed(ewma_fold(daily))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("day").desc())
    capped_daily = (
        daily.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _EWMA_FOLD_DAYS)
        .select("user_id", "day", "cnt")
    )
    t_cap = timed(ewma_fold(capped_daily))
    bot_un = ewma_fold(daily).filter(F.col("user_id") == BOT).first()
    bot_cap = (
        ewma_fold(capped_daily).filter(F.col("user_id") == BOT).first()
    )
    print(
        f"ewma   uncapped {t_un:6.2f}s  bot array={bot_un['n_days']}   "
        f"capped {t_cap:6.2f}s  bot array={bot_cap['n_days']} "
        f"(bound {_EWMA_FOLD_DAYS})"
    )
    assert bot_cap["n_days"] <= _EWMA_FOLD_DAYS

    rows = build_session_rows(spark, n_rows).localCheckpoint()
    # Capped FIRST: the uncapped variant can OOM the executor JVM
    # (measured: java.lang.OutOfMemoryError at 20M rows — a 10M-struct
    # array in ONE aggregation buffer), killing the local session.
    w = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    capped_rows = (
        rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 64)
        .drop("rn")
    )
    t_cap = timed(path_fold(capped_rows))
    bot_cap = (
        path_fold(capped_rows).filter(F.col("user_id") == BOT).first()
    )
    assert bot_cap["n_steps"] <= 64
    try:
        t_un = timed(path_fold(rows))
        bot_un = path_fold(rows).filter(F.col("user_id") == BOT).first()
        un = f"uncapped {t_un:6.2f}s  bot session={bot_un['n_steps']:,} rows"
    except Exception as e:  # noqa: BLE001 — executor OOM is the result
        un = f"uncapped FAILED ({type(e).__name__}: single-buffer OOM)"
    print(
        f"paths  capped {t_cap:6.2f}s  bot session={bot_cap['n_steps']} "
        f"(bound 64)   {un}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
