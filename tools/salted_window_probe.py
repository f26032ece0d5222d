"""Hot-key probe for the salted rank / as-of windows (VERDICT r10 #1).

One bot user owns ~40 % of a year-long event stream — the pathology
where `row_number().over(partitionBy(user))` and the as-of
union+window put 40 % of the table in ONE task.  This probe measures
the r11 fix both ways:

- STRUCTURAL (deterministic, box-independent): the largest window
  partition each form creates.  Classic = max rows per key (the bot's
  whole stream); salted = max rows per (key, bucket) cell — bounded by
  the bot's densest bucket, shrinking with bucket_s, independent of
  how hot the key gets as history grows.
- WALL: classic vs salted forms of rank, as-of, and capped_recent_join
  on the same frame.

At probe scale (tens of millions of rows on one box) walls are close —
a 10M-row sort in one task is seconds; the structural number is the
one that predicts the 100 TB behavior (one task cannot hold 40 % of
100 TB).  That asymmetry is exactly why the r10 verdict flagged the
class even though the sf1-skew wall was 1.0x.

Usage: python tools/salted_window_probe.py [n_rows]  (default 20_000_000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

HOT_USER = 0
N_USERS = 100_000
YEAR_S = 365 * 86400
BUCKET_S = 6 * 3600


def build(spark, n_rows: int):
    """Events: 40 % of rows on HOT_USER, timestamps uniform over one
    year (deterministic xxhash64 placement)."""
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.pmod(F.xxhash64("id"), F.lit(100)) < 40, F.lit(HOT_USER))
            .otherwise(1 + F.pmod(F.xxhash64("id", F.lit(7)), F.lit(N_USERS)))
            .alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + F.pmod(F.xxhash64("id", F.lit(13)), F.lit(YEAR_S))
            ).alias("ts"),
        )
    )


def wall(df) -> float:
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    return time.time() - t0


def main() -> int:
    from sec_edgar_spark.session import get_spark
    from sec_edgar_spark.operators.asof import asof_join
    from sec_edgar_spark.operators.interval import capped_recent_join
    from sec_edgar_spark.operators.relational import salted_rank

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark(app_name="salted-window-probe")
    spark.sparkContext.setLogLevel("ERROR")

    ev = build(spark, n_rows)
    ev.count()  # warm the scan

    # ---- structural: largest window partition ----------------------
    per_key = ev.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    b_us = BUCKET_S * 1_000_000
    cell = (
        ev.select(
            "user_id",
            (
                (
                    F.unix_micros(F.col("ts"))
                    - F.pmod(F.unix_micros(F.col("ts")), F.lit(b_us))
                )
                / F.lit(b_us)
            ).cast("long").alias("_bkt"),
        )
        .groupBy("user_id", "_bkt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    print(
        f"rows={n_rows:,}  hot share=40%  bucket_s={BUCKET_S}\n"
        f"largest window partition  classic(per key): {per_key:,} rows "
        f"({100 * per_key / n_rows:.1f}% of table in ONE task)\n"
        f"largest window partition  salted(per key,bucket): {cell:,} rows "
        f"({100 * cell / n_rows:.3f}% of table; spread over "
        f"~{YEAR_S // BUCKET_S} buckets)",
        flush=True,
    )

    # ---- walls ------------------------------------------------------
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    classic_rank = ev.withColumn("_rk", F.row_number().over(w))
    salted = salted_rank(ev, "user_id", "ts", ["event_id"], bucket_s=BUCKET_S)
    for label, df in (("rank classic", classic_rank), ("rank salted", salted)):
        print(f"{label:28s} {wall(df):7.1f}s", flush=True)

    left = ev.filter(F.col("event_id") % 5 == 0)
    right = ev.filter(F.col("event_id") % 5 != 0).withColumnRenamed(
        "ts", "rts"
    )
    for label, bs in (("asof classic", None), ("asof salted", BUCKET_S)):
        df = asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="rts",
            right_cols=["event_id", "rts"], suffix="_r", bucket_s=bs,
        )
        print(f"{label:28s} {wall(df):7.1f}s", flush=True)

    t0 = time.time()
    out = capped_recent_join(
        left.limit(2_000_000), right, on="user_id", left_ts="ts",
        right_ts="rts", right_id="event_id", k=5, tolerance="7 DAYS",
        bucket_s=BUCKET_S,
    )
    out.write.mode("overwrite").format("noop").save()
    print(f"{'capped_recent_join salted':28s} {time.time() - t0:7.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
