from . import filings  # noqa: F401
