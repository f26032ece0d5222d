from . import dedup, relational, similarity  # noqa: F401
