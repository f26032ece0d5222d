from . import daily_feed, dedup_stream, stateful  # noqa: F401
