"""Driver-side utility parity (reference utils.py:5-83).

The COLUMN forms of these live in ``functions/scalars.py`` (C3-C6) and
run inside codegen; these Python twins exist for parameter validation
and path handling on the driver, with the reference's exact error
behavior so user code ports unchanged.
"""

from __future__ import annotations

import datetime
import errno
import os


def sanitize_date(date):
    """date/datetime → ``YYYYMMDD`` string; strings/ints validated
    (reference utils.py:5-25: TypeError unless already YYYYMMDD)."""
    if isinstance(date, (datetime.datetime, datetime.date)):
        return date.strftime("%Y%m%d")
    if isinstance(date, str):
        if len(date) != 8:
            raise TypeError("Date must be of the form YYYYMMDD")
    elif isinstance(date, int):
        if date < 10**7 or date > 10**8:
            raise TypeError("Date must be of the form YYYYMMDD")
    return date


def get_quarter(date) -> int:
    """Calendar quarter of a date (utils.py:46-52)."""
    return (date.month - 1) // 3 + 1


def get_month(quarter: int) -> int:
    """First month of a quarter (utils.py:55-66)."""
    if not 1 <= quarter <= 4:
        raise TypeError(f"Quarter must be between 1 and 4. Given {quarter}.")
    return 1 + (quarter - 1) * 3


def add_quarter(year: int, quarter: int) -> tuple[int, int]:
    """Next (year, quarter) with Q4→Q1 rollover (utils.py:69-83)."""
    if not 1 <= quarter <= 4:
        raise TypeError(f"Quarter must be between 1 and 4. Given {quarter}.")
    return (year + 1, 1) if quarter == 4 else (year, quarter + 1)


def make_path(path: str, **kwargs) -> None:
    """mkdir -p with the reference's error contract (utils.py:28-43)."""
    try:
        os.makedirs(path, **kwargs)
    except OSError as e:
        if e.errno != errno.EEXIST:
            raise OSError(f"There was a problem creating the path {path}.")
