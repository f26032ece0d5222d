from . import cik_map, company_listing, filings, index, rest  # noqa: F401
