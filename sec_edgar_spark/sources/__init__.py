from . import cik_map, filings, index, rest  # noqa: F401
