"""Exception vocabulary (reference: exceptions.py:1-18).

Same four exception types, same meanings, so user code catching
``EDGARQueryError`` etc. ports unchanged.
"""


class EDGARQueryError(Exception):
    """A query received a response that is not a valid 200 response."""


class CIKError(Exception):
    """An invalid CIK was given."""


class FilingTypeError(Exception):
    """An invalid filing type was given."""


class NoFilingsError(Exception):
    """No filings were found."""
