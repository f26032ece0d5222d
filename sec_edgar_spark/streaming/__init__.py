from . import daily_feed, stateful  # noqa: F401
