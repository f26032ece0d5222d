"""Filing-type vocabulary (SURVEY §1.1).

The reference ships an 804-member ``FilingType`` enum
(core/filing_types.py:4-813) used for request-param validation: a type
outside the enum raises ``FilingTypeError`` — including well-formed
strings EDGAR simply hadn't issued when the enum was written.

This engine ships the same 804 values as package DATA
(``data/filing_types.txt``, one form code per line, extracted verbatim
from the reference enum's values) and validates in two modes:

- ``strict=True`` (default, exact reference parity): membership in the
  804-value vocabulary, case-sensitive, else ``FilingTypeError``.
- ``strict=False`` (forward-compatible): a structural check accepts
  well-formed unknown types — EDGAR adds form types over time and a
  closed vocabulary goes stale.

The vocabulary is data, not code: Spark-side use is a broadcast
``isin`` / IN-list predicate, never a Python-side loop.
"""

from __future__ import annotations

import re
from functools import lru_cache
from importlib import resources


class FilingTypeError(ValueError):
    """Invalid filing type (parity with reference exceptions.py:11-13)."""


@lru_cache(maxsize=1)
def filing_type_enum() -> dict[str, str]:
    """The reference's full 804-member FilingType enum as a
    name→value dict (core/filing_types.py:4-813, verbatim) — e.g.
    ``{"FILING_10K": "10-K", ...}``.  The CLI accepts these enum
    names like the reference's ``FilingType[ftype]`` lookup
    (cli.py:90-93)."""
    text = (
        resources.files("sec_edgar_spark.data")
        .joinpath("filing_types.txt")
        .read_text(encoding="utf-8")
    )
    out = {}
    for line in text.split("\n"):
        if line:
            name, _, value = line.partition("\t")
            out[name] = value
    return out


@lru_cache(maxsize=1)
def filing_type_vocabulary() -> frozenset[str]:
    """The 804 form-type *values* (enum values verbatim)."""
    return frozenset(filing_type_enum().values())


# Core vocabulary (the high-traffic subset) — kept for broadcast
# IN-list predicates where the full set is overkill.
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

# Well-formed form code: the vocabulary's own shapes generalized
# (upper/lower alphanumerics, space, dot, slash, dash; ≤19 chars).
_STRUCTURE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9 ./-]{0,18}$")


def validate_filing_type(form_type: str, strict: bool = True) -> str:
    """Validate a form type.

    ``strict=True`` reproduces the reference enum exactly: only the
    804 known values pass.  ``strict=False`` accepts any structurally
    well-formed code (forward compatibility with new EDGAR forms).
    """
    if not isinstance(form_type, str):
        raise FilingTypeError(f"invalid filing type: {form_type!r}")
    if strict:
        if form_type not in filing_type_vocabulary():
            raise FilingTypeError(f"invalid filing type: {form_type!r}")
        return form_type
    if not _STRUCTURE.match(form_type):
        raise FilingTypeError(f"invalid filing type: {form_type!r}")
    return form_type


def is_ownership_form(form_type_col):
    """Ownership filter predicate (F9, company.py:226-235): forms 3/4/5
    and their amendments."""
    from pyspark.sql import functions as F

    base = F.regexp_replace(form_type_col, "/A$", "")
    return base.isin("3", "4", "5")
