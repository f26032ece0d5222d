"""ComboFilings date-split planner (reference combo.py:137-199).

On the QUERY side this engine doesn't need the split at all — a
``date_filed BETWEEN`` predicate over the (year, quarter)-partitioned
index mirror partition-prunes to exactly the right files.  The split
survives here for the INGESTION side: when building or topping up the
mirror, it decides which quarterly idx files to fetch whole and which
days to fetch daily — the same balancing the reference does per query,
done once at mirror-build time.

Faithful to the reference's algorithm, including the 30-day balancing
point and its edge cases; the one representational change is that the
reference's ``lambda`` entry filters become declarative ``(min_date,
max_date)`` clip bounds (None = unclipped), which downstream turns
into a Column predicate instead of a row callable.
"""

from __future__ import annotations

import datetime


def _get_quarter(d: datetime.date) -> int:
    return (d.month - 1) // 3 + 1


def _get_month(quarter: int) -> int:
    return 1 + (quarter - 1) * 3


def _add_quarter(year: int, quarter: int) -> tuple[int, int]:
    return (year + 1, 1) if quarter == 4 else (year, quarter + 1)


def fill_days(
    start: datetime.date,
    end: datetime.date,
    include_start: bool = False,
    include_end: bool = False,
) -> list[datetime.date]:
    """Inclusive/exclusive date enumeration (reference combo.py:12-28)."""
    lo = 0 if include_start else 1
    hi = (end - start).days + (1 if include_end else 0)
    return [start + datetime.timedelta(days=i) for i in range(lo, hi)]


def combo_date_split(
    start_date: datetime.date,
    end_date: datetime.date,
    balancing_point: int = 30,
) -> tuple[
    list[tuple[int, int, tuple[datetime.date | None, datetime.date | None]]],
    list[datetime.date],
]:
    """(quarterly, daily) fetch plan for a date range.

    ``quarterly``: (year, quarter, (min_date, max_date)) — fetch the
    whole quarter's idx, clip rows to the bounds (None = no clip; the
    reference's ``lambda x: True`` / date-compare lambdas).
    ``daily``: individual dates to fetch daily idx files for.

    A partial quarter is fetched whole (then clipped) when it spans
    more than ``balancing_point`` days, else day-by-day — the
    reference's exact trade-off (combo.py:160-199).
    """
    current = start_date
    quarterly: list[tuple[int, int, tuple]] = []
    daily: list[datetime.date] = []
    while current <= end_date:
        q = _get_quarter(current)
        y = current.year
        ny, nq = _add_quarter(y, q)
        next_q_start = datetime.date(ny, _get_month(nq), 1)
        days_till_next_quarter = (next_q_start - current).days
        days_till_end = (end_date - current).days
        if days_till_next_quarter <= days_till_end:
            q_start = datetime.date(y, _get_month(q), 1)
            if q_start == current:
                quarterly.append((y, q, (None, None)))
                current = next_q_start
            elif days_till_next_quarter > balancing_point:
                quarterly.append((y, q, (start_date, None)))
                current = next_q_start
            else:
                daily.extend(
                    fill_days(current, next_q_start, True, False)
                )
                current = next_q_start
        else:
            if days_till_end > balancing_point:
                if days_till_next_quarter - 1 == days_till_end:
                    quarterly.append((y, q, (None, None)))
                    current = next_q_start
                else:
                    quarterly.append((y, q, (None, end_date)))
                    current = end_date
            else:
                daily.extend(fill_days(current, end_date, True, True))
                break
    return quarterly, daily


def combo_idx_paths(
    base: str,
    start_date: datetime.date,
    end_date: datetime.date,
    balancing_point: int = 30,
) -> list[str]:
    """Mirror idx paths the plan touches — quarterly files first, then
    daily files (era-correct filenames)."""
    from ..sources.index import daily_idx_path, quarterly_idx_path

    quarterly, daily = combo_date_split(start_date, end_date, balancing_point)
    paths = [quarterly_idx_path(base, y, q) for y, q, _ in quarterly]
    paths += [daily_idx_path(base, d) for d in daily]
    return paths
