"""Ticker/title → CIK dimension (SURVEY §2.1 S5, §2.3 J1).

The reference loads ``company_tickers.json`` into two upper-cased
Python dicts with ``lru_cache`` (cik_lookup.py:10-37) and probes them
per lookup term, with an HTML-scrape fallback for misses
(cik_lookup.py:107-174).  Spark-first: the JSON becomes a small
dimension DataFrame (cached ≈ lru_cache), resolution is a broadcast
left join with a COALESCE fallback chain, and only the unresolved
remainder would ever hit the (rare, rate-limited) scrape path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def read_cik_map(spark: SparkSession, path: str) -> DataFrame:
    """``company_tickers.json`` → (ticker, title, cik_str) dimension.

    The file is one object keyed by row ordinal:
    ``{"0": {"cik_str": 320193, "ticker": "AAPL", "title": "Apple Inc."}, ...}``
    — read as a map and exploded to rows; keys upper-cased like
    cik_lookup.py:35-37.
    """
    raw = spark.read.option("multiLine", "true").json(path)
    # Each top-level field is one entry struct; stack them to rows in
    # ordinal (insertion) order — the reference's dict comprehension
    # (cik_lookup.py:35-37) makes the *last* occurrence of a duplicate
    # ticker/title win, so the ordinal must survive to the dedup below.
    ordered = sorted(raw.columns, key=int)
    entries = F.array(*[F.col(f"`{c}`") for c in ordered])
    return (
        raw.select(F.posexplode(entries).alias("ord", "e"))
        .select(
            F.col("ord"),
            F.upper("e.ticker").alias("ticker"),
            F.upper("e.title").alias("title"),
            F.col("e.cik_str").cast("long").alias("cik_str"),
        )
        .cache()
    )


def resolve_ciks(lookups: DataFrame, cik_map: DataFrame) -> DataFrame:
    """J1 CIK resolution (cik_lookup.py:195-226) as one broadcast plan.

    ``lookups`` has a single ``lookup_term`` column.  Chain:
    all-digits pass-through → ticker probe → title probe; unresolved
    rows keep NULL cik (callers may route them to a scrape stage).
    Returns (lookup_term, cik, resolved_by).
    """
    term = F.upper(F.col("lookup_term"))
    # One row per key, last JSON entry wins — mirrors the reference's
    # dict-probe semantics (duplicate titles across share classes fan
    # out a join otherwise; cik_lookup.py:35-37 keeps one value).
    ord_col = (
        F.col("ord") if "ord" in cik_map.columns else F.monotonically_increasing_id()
    )
    keyed = cik_map.withColumn("_ord", ord_col)
    tick = (
        keyed.groupBy(F.col("ticker").alias("_t"))
        .agg(F.max_by("cik_str", "_ord").alias("_tcik"))
    )
    title = (
        keyed.groupBy(F.col("title").alias("_n"))
        .agg(F.max_by("cik_str", "_ord").alias("_ncik"))
    )
    digits = F.col("lookup_term").rlike("^[0-9]+$")
    out = (
        lookups.join(broadcast(tick), term == F.col("_t"), "left")
        .join(broadcast(title), term == F.col("_n"), "left")
        .select(
            "lookup_term",
            F.coalesce(
                F.when(digits, F.col("lookup_term").cast("long")),
                F.col("_tcik"),
                F.col("_ncik"),
            ).alias("cik"),
            F.when(digits, F.lit("digits"))
            .when(F.col("_tcik").isNotNull(), F.lit("ticker"))
            .when(F.col("_ncik").isNotNull(), F.lit("title"))
            .alias("resolved_by"),
        )
    )
    return out
