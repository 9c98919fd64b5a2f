"""Retry with exponential backoff + poll-until-terminal-state.

Reference parity: `sqlcmd_with_backoff` retries up to ATTEMPTS (default
9) with sleep TIMEOUT (default 2 s) doubling per attempt
(/root/reference/backup.sh:39-72); the async task poll loops re-check
every 30 s while status ∈ {CREATED, IN_PROGRESS}
(/root/reference/backup.sh:140-164, 341-365).

Used for driver-side IO (object-store calls, external services). Spark
*task* retries are left to `spark.task.maxFailures`.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable
from typing import TypeVar

T = TypeVar("T")


class RetriesExhausted(RuntimeError):
    pass


class PollTimeout(RuntimeError):
    pass


def retry(
    fn: Callable[[], T],
    attempts: int = 9,
    base_delay_s: float = 2.0,
    factor: float = 2.0,
    retryable: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[int, BaseException], None] | None = None,
) -> T:
    """Run `fn` up to `attempts` times; sleep base·factor^i between tries."""
    delay = base_delay_s
    last: BaseException | None = None
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except retryable as exc:  # noqa: PERF203
            last = exc
            if on_retry is not None:
                on_retry(attempt, exc)
            if attempt == attempts:
                break
            sleep(delay)
            delay *= factor
    raise RetriesExhausted(f"failed after {attempts} attempts") from last


def poll(
    fetch_status: Callable[[], str],
    in_progress: Iterable[str] = ("CREATED", "IN_PROGRESS"),
    success: Iterable[str] = ("SUCCESS",),
    interval_s: float = 30.0,
    timeout_s: float = 3600.0,
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
) -> str:
    """Poll until a terminal state; return it. Raise on timeout or on a
    terminal non-success state (the reference's `fail "…status: $STATUS"`
    branch, /root/reference/backup.sh:158-164)."""
    in_progress = set(in_progress)
    success = set(success)
    deadline = clock() + timeout_s
    while True:
        status = fetch_status()
        if status in success:
            return status
        if status not in in_progress:
            raise RuntimeError(f"terminal failure state: {status}")
        if clock() >= deadline:
            raise PollTimeout(f"still {status} after {timeout_s}s")
        sleep(interval_s)
