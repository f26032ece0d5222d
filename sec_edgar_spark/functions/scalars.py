"""EDGAR scalar functions as Column expressions (SURVEY §2.8 C1-C13).

Every function here is a pure Column→Column helper built from
``pyspark.sql.functions`` builtins, so each stays inside whole-stage
codegen — no Python UDFs on the hot path.  Reference semantics cited per
function (path:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EDGAR_BASE_URL = "https://www.sec.gov/"
EDGAR_ARCHIVES_PREFIX = "Archives/"


def accession_number(url: Column | str) -> Column:
    """C1 — last path segment of a filing URL, minus its extension.

    Reference: ``get_accession_number`` (core/_base.py:72-79) returns
    ``url.split("/")[-1]`` e.g. ``0000320193-20-000010.txt``; callers then
    strip ``.txt``.  We return the bare accession (no extension), the
    join key used by S14/J2.
    """
    last = F.element_at(F.split(F.col(url) if isinstance(url, str) else url, "/"), -1)
    return F.regexp_replace(last, r"\.[A-Za-z0-9]+$", "")


def accession_filename(url: Column | str) -> Column:
    """C1 exact form — ``url.split('/')[-1]`` (core/_base.py:72-79)."""
    return F.element_at(F.split(F.col(url) if isinstance(url, str) else url, "/"), -1)


def clean_directory_path(path: Column | str) -> Column:
    """C2 — strip chars outside ``[0-9A-Za-z\\s]``, spaces→underscores
    (core/_base.py:81-90)."""
    c = F.col(path) if isinstance(path, str) else path
    return F.regexp_replace(F.regexp_replace(c, r"[^0-9A-Za-z\s]", ""), r"\s", "_")


def sanitize_date_yyyymmdd(d: Column | str) -> Column:
    """C3 — date/timestamp → ``yyyyMMdd`` string (utils.py:5-25)."""
    c = F.col(d) if isinstance(d, str) else d
    return F.date_format(c, "yyyyMMdd")


def quarter_of(d: Column | str) -> Column:
    """C4 — calendar quarter of a date (utils.py:46-52: (month-1)//3+1)."""
    c = F.col(d) if isinstance(d, str) else d
    return F.quarter(c)


def month_of_quarter(q: Column | str) -> Column:
    """C5 — first month of a quarter (utils.py:55-66: 1+(q-1)*3)."""
    c = F.col(q) if isinstance(q, str) else q
    return (c - F.lit(1)) * F.lit(3) + F.lit(1)


def add_quarter(year: Column, quarter: Column) -> tuple[Column, Column]:
    """C6 — next (year, quarter) with rollover (utils.py:69-83)."""
    next_year = F.when(quarter == 4, year + 1).otherwise(year)
    next_quarter = F.when(quarter == 4, F.lit(1)).otherwise(quarter + 1)
    return next_year, next_quarter


def epoch_s(ts: Column | str) -> Column:
    """Epoch seconds from any timestamp flavor, portably across Spark 4.x.

    Parquet no-tz ``timestamp[us]`` columns infer as TIMESTAMP_NTZ under
    Spark >= 4.1, and NTZ -> BIGINT is an AnalysisException
    (DATATYPE_MISMATCH).  NTZ -> TIMESTAMP is legal, and with the session
    timezone pinned to UTC (session.py) the wall-clock value is unchanged,
    so ``cast("timestamp").cast("long")`` yields identical epoch seconds
    on every Spark version.  Use this instead of ``col.cast("long")``
    anywhere a timestamp becomes arithmetic.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return c.cast("timestamp").cast("long")


def fill_days(start: Column, end: Column) -> Column:
    """C7 — inclusive date sequence between two dates (combo.py:12-28).

    Boundary-exclusive variants are trims: ``slice``/filter on the array.
    """
    return F.sequence(start, end, F.expr("interval 1 day"))


def daily_idx_date(d: Column | str) -> Column:
    """C8 — era-dependent daily-index date token (core/daily.py:118-132).

    <1995: ``MMddyy``; 1995-01-01..1998-03-30: ``yyMMdd`` (the
    reference's boundary is a strict ``< date(1998, 3, 31)``,
    daily.py:129, so 1998-03-31 itself is ``yyyyMMdd``); else
    ``yyyyMMdd``.
    """
    c = F.col(d) if isinstance(d, str) else d
    return (
        F.when(F.year(c) < 1995, F.date_format(c, "MMddyy"))
        .when(c < F.lit("1998-03-31").cast("date"), F.date_format(c, "yyMMdd"))
        .otherwise(F.date_format(c, "yyyyMMdd"))
    )


def parse_idx_date(s: Column | str) -> Column:
    """C8 inverse — normalize any idx date shape (``yyyy-MM-dd`` in
    quarterly rows, ``yyyyMMdd`` in daily rows, ``MM-dd-yyyy`` in the
    pre-1998 daily era) to DateType (SURVEY §1.2).
    """
    c = F.col(s) if isinstance(s, str) else s
    # try_to_date (not to_date): under ANSI mode a format mismatch must
    # yield NULL so the coalesce can try the next shape.  MM-dd-yyyy
    # goes last — it can never false-match the first two (a yyyy-MM-dd
    # string fails its month field; a yyyyMMdd string has no dashes).
    return F.coalesce(
        F.try_to_date(c, "yyyy-MM-dd"),
        F.try_to_date(c, "yyyyMMdd"),
        F.try_to_date(c, "MM-dd-yyyy"),
    )


def txt_url(index_href: Column | str) -> Column:
    """C9 — filing index-page URL → raw ``.txt`` URL (company.py:295):
    ``link[:link.rfind("-")] + ".txt"``."""
    c = F.col(index_href) if isinstance(index_href, str) else index_href
    return F.concat(F.regexp_extract(c, r"^(.*)-", 1), F.lit(".txt"))


def cik_zfill(cik: Column | str) -> Column:
    """C10 — zero-pad CIK to 10 chars for REST URLs (rest.py:71)."""
    c = F.col(cik) if isinstance(cik, str) else cik
    return F.lpad(c.cast("string"), 10, "0")


def normalize_key(s: Column | str) -> Column:
    """C11 — upper-case lookup normalization (cik_lookup.py:35-37)."""
    c = F.col(s) if isinstance(s, str) else s
    return F.upper(c)


def full_url(path: Column | str, base: str = EDGAR_BASE_URL) -> Column:
    """C12 — prepend the EDGAR base URL (client.py:142-152)."""
    c = F.col(path) if isinstance(path, str) else path
    return F.concat(F.lit(base), c)


def archives_path(file_name: Column | str) -> Column:
    """F2 — ``path = 'Archives/' + file_name`` (core/_index.py:168)."""
    c = F.col(file_name) if isinstance(file_name, str) else file_name
    return F.concat(F.lit(EDGAR_ARCHIVES_PREFIX), c)


def save_path(
    dir_pattern: str,
    file_pattern: str,
    **cols: Column,
) -> Column:
    """C13 — patterned save path (daily.py:157-166, quarterly.py:123-130).

    Patterns use ``{cik}``, ``{type}``, ``{date}``, ``{year}``,
    ``{quarter}``, ``{accession_number}`` template vars; we substitute
    with concat so the whole path stays a codegen'd expression.
    """
    template = dir_pattern.rstrip("/") + "/" + file_pattern
    parts: list[Column] = []
    rest = template
    while rest:
        lb = rest.find("{")
        if lb < 0:
            parts.append(F.lit(rest))
            break
        if lb > 0:
            parts.append(F.lit(rest[:lb]))
        rb = rest.index("}", lb)
        var = rest[lb + 1 : rb]
        if var not in cols:
            raise KeyError(f"save_path pattern var {{{var}}} not provided")
        parts.append(cols[var].cast("string"))
        rest = rest[rb + 1 :]
    return F.concat(*parts)
