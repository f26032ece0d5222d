"""Full filing-type vocabulary parity (reference core/filing_types.py:4-813)."""

import os
import re

import pytest

from sec_edgar_spark.filing_types import (
    FilingTypeError,
    filing_type_vocabulary,
    validate_filing_type,
)

REF_ENUM = "/root/reference/secedgar/core/filing_types.py"


def test_vocabulary_size():
    assert len(filing_type_vocabulary()) == 804


@pytest.mark.skipif(not os.path.isfile(REF_ENUM), reason="reference unavailable")
def test_every_reference_enum_value_accepted():
    ref_values = set()
    with open(REF_ENUM) as fh:
        for line in fh:
            m = re.match(r"\s*FILING_\w+\s*=\s*'(.*)'", line)
            if m:
                ref_values.add(m.group(1))
    assert ref_values == filing_type_vocabulary()
    for v in ref_values:
        assert validate_filing_type(v) == v


@pytest.mark.parametrize(
    "rejected",
    [
        "10-K ",        # trailing space — not an enum value
        "10-k",         # case differs from the enum's '10-K'
        "NOT-A-FORM",   # well-formed but unknown -> reference rejects
        "not a form!!",
        "",
        None,
        123,
    ],
)
def test_reference_rejected_strings_rejected(rejected):
    with pytest.raises(FilingTypeError):
        validate_filing_type(rejected)


def test_lenient_mode_accepts_well_formed_unknowns():
    assert validate_filing_type("NOT-A-FORM", strict=False) == "NOT-A-FORM"
    with pytest.raises(FilingTypeError):
        validate_filing_type("not a form!!", strict=False)


def test_lowercase_enum_members_accepted():
    # The reference enum really does contain lowercase values.
    assert validate_filing_type("10-k405") == "10-k405"
    assert validate_filing_type("sec staff action") == "sec staff action"


def test_enum_name_lookup():
    from sec_edgar_spark.filing_types import filing_type_enum

    e = filing_type_enum()
    assert e["FILING_10K"] == "10-K"
    assert e["FILING_4"] == "4"
    assert len(e) == 804


def test_cli_accepts_enum_name(spark):
    from sec_edgar_spark.cli import main

    rc = main(
        [
            "--index", "tests/data/full-index/1996/QTR4/master.idx",
            "--filing-type", "FILING_10K",
            "--show", "1",
        ],
        spark=spark,
    )
    assert rc == 0
