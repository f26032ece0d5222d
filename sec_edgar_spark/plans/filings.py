"""The ``filings(...)`` planner facade (SURVEY §3.1 dispatch matrix).

The reference's top-level API selects an access path imperatively:
company-XML when ``cik_lookup`` is given, else daily / quarterly /
combo index scans chosen by date arithmetic (core/filings.py:135-193),
where ComboFilings splits a range into whole quarters + leftover days
with a 30-day balancing heuristic (combo.py:137-199).

Spark-first, the *entire* dispatch collapses into ONE declarative plan
over the date-partitioned index mirror: a ``between`` filter Catalyst
turns into partition pruning.  What remains of the dispatcher is
argument validation and the filter-composition semantics:

- ``filing_type`` → equality predicate (F4/F6, filings.py:152-155)
- ``start/end`` → date between (F7/F8)
- ``count``   → per-CIK newest-first top-k (L1) — the reference raises
  NotImplementedError for index paths (filings.py:157-160); here it is
  uniform (capability superset, SURVEY §2.6 L3)
- ``user_filter`` → arbitrary Column predicate (F3 entry_filter), or a
  Python callable auto-wrapped over the row struct (slow path, kept for
  API parity with the reference's only extension hook)
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..filing_types import validate_filing_type


def filings(
    index: DataFrame,
    filing_type: str | None = None,
    start_date: _dt.date | str | None = None,
    end_date: _dt.date | str | None = None,
    count: int | None = None,
    cik_lookup: DataFrame | None = None,
    cik_map: DataFrame | None = None,
    user_filter: Column | Callable | None = None,
    ownership: str = "include",
    match_format: str = "ALL",
    fetch_html: Callable | None = None,
) -> DataFrame:
    """Build the filing query plan over the canonical index DataFrame.

    Returns the matching index rows (with ``url``), newest-first per
    CIK when ``count`` is given.  ``cik_lookup`` (a one-column
    ``lookup_term`` frame) restricts to resolved companies via the
    broadcast J1 join against ``cik_map``.
    """
    if ownership not in ("include", "exclude"):
        # F9 validated enum (company.py:226-235)
        raise ValueError(f"ownership must be include|exclude, got {ownership!r}")
    if match_format not in ("ALL", "EXACT", "AMEND"):
        # F10 validated enum (company.py:158-166)
        raise ValueError(f"match_format must be ALL|EXACT|AMEND, got {match_format!r}")

    df = index
    if filing_type is not None:
        validate_filing_type(filing_type)
        df = df.filter(F.col("form_type") == filing_type)
    if ownership == "exclude":
        from ..filing_types import is_ownership_form

        df = df.filter(~is_ownership_form(F.col("form_type")))
    if match_format == "EXACT":
        df = df.filter(~F.col("form_type").endswith("/A"))
    elif match_format == "AMEND":
        df = df.filter(F.col("form_type").endswith("/A"))
    if start_date is not None and end_date is not None:
        df = df.filter(F.col("date_filed").between(start_date, end_date))
    elif start_date is not None:
        df = df.filter(F.col("date_filed") >= start_date)
    elif end_date is not None:
        df = df.filter(F.col("date_filed") <= end_date)

    if cik_lookup is not None:
        if cik_map is None:
            raise ValueError("cik_lookup requires cik_map")
        if fetch_html is not None:
            # Full reference chain: map probe, then HTML-scrape the
            # unresolved remainder (cik_lookup.py:107-174).
            from ..sources.cik_scrape import resolve_ciks_with_scrape

            chain = resolve_ciks_with_scrape(cik_lookup, cik_map, fetch_html)
        else:
            from ..sources.cik_map import resolve_ciks

            chain = resolve_ciks(cik_lookup, cik_map)
        resolved = (
            chain.filter(F.col("cik").isNotNull())
            .select("cik")
            .distinct()
        )
        df = df.join(F.broadcast(resolved), "cik", "left_semi")

    if user_filter is not None:
        if isinstance(user_filter, Column):
            df = df.filter(user_filter)
        else:
            # entry_filter parity (_index.py:46-59): arbitrary Python
            # predicate over the row (the reference's FilingEntry
            # namedtuple ≈ a Row here).  Row-at-a-time by definition —
            # off the codegen fast path; prefer Column predicates.
            _pred = F.udf(lambda row: bool(user_filter(row)), "boolean")
            df = df.filter(_pred(F.struct(*[F.col(c) for c in df.columns])))

    df = df.withColumn(
        "url", F.concat(F.lit("https://www.sec.gov/"), F.col("path"))
    )

    if count is not None:
        w = Window.partitionBy("cik").orderBy(
            F.desc("date_filed"), F.asc("line_no")
        )
        df = (
            df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= count)
            .drop("_rk")
        )
    return df


def grouped_urls(filings_df: DataFrame) -> DataFrame:
    """A1 result shape: (cik, urls sorted by (date, line)) — the
    dict[cik → [url]] of get_urls (_index.py:181-195) as a table."""
    return (
        filings_df.groupBy("cik")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("date_filed", "line_no", "url"))
                ),
                lambda s: s.getField("url"),
            ).alias("urls")
        )
    )
