"""HTTP client semantics: validation + retry/backoff (S11/F11).

Re-expresses the reference's ``NetworkClient`` contract
(client.py:64-69, 154-205) without the requests/urllib3 dependency:

- **Parameter validation** — ``ClientConfig`` enforces the same setter
  rules (client.py:75-135): ``retry_count`` non-negative int,
  ``backoff_factor`` int/float, ``batch_size`` positive int,
  ``rate_limit`` in (0, 10], ``user_agent`` str.
- **Response validation** — ``validate_response`` rejects EDGAR
  error-message bodies with ``EDGARQueryError`` and rewrites the 429
  reason to the reference's rate-limit message (client.py:154-177).
- **Retry with backoff** — ``get_with_retry`` emulates
  ``urllib3.util.retry.Retry(retry_count, backoff_factor=...,
  raise_on_status=True)`` (client.py:195-205): retryable statuses and
  transport exceptions are retried up to ``retry_count`` times with
  exponential backoff ``backoff_factor * 2**(n-1)``; exhaustion raises.

The transport itself stays injectable (``http_get(url) -> (status,
bytes)``) so the whole stack is hermetic under test and the Spark fetch
stage (sources/filings.py) can run it inside mapPartitions unchanged.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from ..exceptions import EDGARQueryError

#: Bodies EDGAR returns with HTTP 200 that are really errors
#: (reference client.py:163-166).
ERROR_MESSAGES = (
    "The value you submitted is not valid",
    "No matching Ticker Symbol.",
    "No matching CIK.",
    "No matching companies.",
)

#: Reference's rewritten 429 reason (client.py:169-173).
RATE_LIMIT_MESSAGE = (
    "Error: You have hit the rate limit. "
    "SEC has banned your IP for 10 minutes. "
    "Please wait 10 minutes before making another request. "
    "https://www.sec.gov/privacy.htm#security"
)

#: Statuses worth retrying — urllib3's RETRY_AFTER_STATUS_CODES plus
#: the 5xx server errors the reference's Retry(raise_on_status=True)
#: would surface.
RETRY_STATUSES = frozenset({413, 429, 500, 502, 503, 504})


class ClientConfig:
    """Validated client parameters (reference client.py:64-135)."""

    def __init__(
        self,
        user_agent: str,
        retry_count: int = 3,
        batch_size: int = 10,
        backoff_factor: float = 0,
        rate_limit: int = 10,
    ):
        self.user_agent = user_agent
        self.retry_count = retry_count
        self.batch_size = batch_size
        self.backoff_factor = backoff_factor
        self.rate_limit = rate_limit

    @property
    def user_agent(self) -> str:
        return self._user_agent

    @user_agent.setter
    def user_agent(self, value):
        if not isinstance(value, str):
            raise TypeError(
                f"user_agent must be str. Given type {type(value)}."
            )
        self._user_agent = value

    @property
    def retry_count(self) -> int:
        return self._retry_count

    @retry_count.setter
    def retry_count(self, value):
        if not isinstance(value, int) or isinstance(value, bool):
            raise TypeError(
                f"Retry count must be int. Given type {type(value)}."
            )
        if value < 0:
            raise ValueError(
                f"Retry count must be greater than 0. Given {value}."
            )
        self._retry_count = value

    @property
    def batch_size(self) -> int:
        return self._batch_size

    @batch_size.setter
    def batch_size(self, value):
        if not isinstance(value, int) or isinstance(value, bool):
            raise TypeError(
                f"Batch size must be int. Given type {type(value)}."
            )
        if value < 1:
            raise ValueError("Batch size must be positive integer.")
        self._batch_size = value

    @property
    def backoff_factor(self) -> float:
        return self._backoff_factor

    @backoff_factor.setter
    def backoff_factor(self, value):
        if not isinstance(value, (int, float)) or isinstance(value, bool):
            raise TypeError(
                f"Backoff factor must be int or float. Given type {type(value)}."
            )
        self._backoff_factor = value

    @property
    def rate_limit(self) -> int:
        return self._rate_limit

    @rate_limit.setter
    def rate_limit(self, value):
        if not 0 < value <= 10:
            raise ValueError(
                "Rate must be greater than 0 and less than or equal to 10."
            )
        self._rate_limit = value


def validate_response(status: int, body: bytes | str) -> None:
    """Reject invalid EDGAR responses (reference client.py:154-177).

    Raises ``EDGARQueryError`` when the body carries one of EDGAR's
    in-band error messages, or on a 429 with the reference's
    rate-limit message as the error text.  Returns None when valid.
    """
    if status == 429:
        raise EDGARQueryError(RATE_LIMIT_MESSAGE)
    text = (
        body.decode("utf-8", errors="replace")
        if isinstance(body, (bytes, bytearray))
        else body
    )
    if any(m in text for m in ERROR_MESSAGES):
        raise EDGARQueryError(
            "No results were found or the value submitted was not valid."
        )


def backoff_seconds(backoff_factor: float, retry_number: int) -> float:
    """urllib3 backoff schedule: ``factor * 2**(n-1)``, 0 for the
    first retry (urllib3 Retry.get_backoff_time semantics)."""
    if retry_number <= 1:
        return 0.0
    return backoff_factor * (2 ** (retry_number - 1))


def get_with_retry(
    http_get: Callable[[str], tuple[int, bytes]],
    url: str,
    retry_count: int = 3,
    backoff_factor: float = 0,
    validate: bool = True,
    sleep: Callable[[float], None] = time.sleep,
) -> tuple[int, bytes]:
    """One URL through the reference's retry loop (client.py:195-205).

    Up to ``retry_count`` retries after the first attempt; a retry
    fires on a transport exception or a status in ``RETRY_STATUSES``,
    sleeping ``backoff_factor * 2**(n-1)`` before retry *n* (n>=2).
    Exhaustion raises ``EDGARQueryError`` (``raise_on_status=True``).
    On success, the body is validated per ``validate_response``.
    """
    last_status: int | None = None
    last_exc: Exception | None = None
    for attempt in range(retry_count + 1):
        if attempt > 0:
            pause = backoff_seconds(backoff_factor, attempt)
            if pause > 0:
                sleep(pause)
        try:
            status, content = http_get(url)
        except Exception as exc:  # transport error -> retryable
            last_exc, last_status = exc, None
            continue
        if status in RETRY_STATUSES:
            last_status, last_exc = status, None
            continue
        if validate:
            validate_response(status, content)
        return status, content
    if last_status == 429:
        raise EDGARQueryError(RATE_LIMIT_MESSAGE)
    if last_exc is not None:
        raise EDGARQueryError(
            f"Request for {url} failed after {retry_count} retries: {last_exc!r}"
        )
    raise EDGARQueryError(
        f"Request for {url} returned status {last_status} after "
        f"{retry_count} retries."
    )
