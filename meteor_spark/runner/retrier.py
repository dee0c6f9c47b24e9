"""Exponential-backoff retrier for sink writes.

Mirrors the reference's retrier (reference: agent/retrier.go:11-14,36-59):
default 5 max retries, 5s initial interval, 5x multiplier, and ONLY
RetryError-wrapped failures are retried — permanent errors propagate
immediately. Spark task retries cover compute; this covers sink-side
network calls made from the driver or inside foreachPartition.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from typing import TypeVar

from meteor_spark.plugins_base import RetryError

log = logging.getLogger(__name__)

DEFAULT_MAX_RETRIES = 5
DEFAULT_INITIAL_INTERVAL_S = 5.0
DEFAULT_MULTIPLIER = 5.0

T = TypeVar("T")


def retry(
    fn: Callable[[], T],
    *,
    max_retries: int = DEFAULT_MAX_RETRIES,
    initial_interval_s: float = DEFAULT_INITIAL_INTERVAL_S,
    multiplier: float = DEFAULT_MULTIPLIER,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    interval = initial_interval_s
    attempt = 0
    while True:
        try:
            return fn()
        except RetryError as e:
            attempt += 1
            if attempt > max_retries:
                raise
            log.warning("retrying (%d/%d) after error: %s", attempt, max_retries, e)
            sleep(interval)
            interval *= multiplier
