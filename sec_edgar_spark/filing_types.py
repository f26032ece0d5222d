"""Filing-type vocabulary (SURVEY §1.1).

The reference ships an 804-member ``FilingType`` enum
(core/filing_types.py:4-813) used only for request-param validation.
The engine keeps the vocabulary as a *set* plus a structural validator:
unknown-but-well-formed types pass with the structural check (EDGAR
adds form types over time; a closed enum goes stale), while clearly
malformed input still fails fast like the reference's FilingTypeError
(exceptions.py:11-13).
"""

from __future__ import annotations

import re

# Core vocabulary (the high-traffic subset; the full 804-member list is
# validated structurally below).
COMMON_FILING_TYPES = frozenset(
    {
        "10-K", "10-K/A", "10-Q", "10-Q/A", "8-K", "8-K/A",
        "20-F", "40-F", "6-K", "S-1", "S-1/A", "S-3", "S-4",
        "3", "3/A", "4", "4/A", "5", "5/A",
        "SC 13D", "SC 13D/A", "SC 13G", "SC 13G/A",
        "DEF 14A", "DEFA14A", "13F-HR", "13F-NT",
        "424B1", "424B2", "424B3", "424B4", "424B5",
        "N-1A", "N-CSR", "N-Q", "X-17A-5",
    }
)

_STRUCTURE = re.compile(r"^[A-Z0-9][A-Z0-9 ./-]{0,18}(/A)?$")


class FilingTypeError(ValueError):
    """Invalid filing type (parity with reference exceptions.py:11-13)."""


def validate_filing_type(form_type: str) -> str:
    if not isinstance(form_type, str) or not _STRUCTURE.match(form_type or ""):
        raise FilingTypeError(f"invalid filing type: {form_type!r}")
    return form_type


def is_ownership_form(form_type_col):
    """Ownership filter predicate (F9, company.py:226-235): forms 3/4/5
    and their amendments."""
    from pyspark.sql import functions as F

    base = F.regexp_replace(form_type_col, "/A$", "")
    return base.isin("3", "4", "5")
