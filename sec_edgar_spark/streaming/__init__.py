from . import daily_feed  # noqa: F401
