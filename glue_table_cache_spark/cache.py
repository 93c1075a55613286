"""Driver-side LRU+TTL cache with per-key single-flight and retry/bail.

Semantic port of the reference's caching layer
(/root/reference/src/glue-table-cache.ts:75-84,135-204,349-466):

* LRU bounded by ``max_entries``; entries expire after ``ttl_ms``;
* one loader runs per key at a time (single-flight) — concurrent callers
  block on the in-flight load and share its result *or its error*;
* loads retry up to 3 times with 200–500 ms backoff, except errors whose
  ``status_code`` is 400/403, which bail immediately
  (/root/reference/src/glue-table-cache.ts:178-196).

This is plain Python on the Spark driver: cluster metadata is
driver-scale, exactly as it is process-local in the reference's single
Node process (SURVEY.md §3).
"""

from __future__ import annotations

import random
import threading
import time
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any, Callable, Generic, TypeVar

T = TypeVar("T")


@dataclass
class CacheEntry(Generic[T]):
    """= reference ``CacheEntry`` (/root/reference/src/types.ts:51-57)."""

    timestamp: float
    data: T


class LruTtlCache(Generic[T]):
    def __init__(
        self,
        max_entries: int = 100,
        ttl_ms: int = 3_600_000,
        retry_attempts: int = 3,
        retry_min_backoff_s: float = 0.2,
        retry_max_backoff_s: float = 0.5,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.max_entries = max_entries
        self.ttl_s = ttl_ms / 1000.0
        self.retry_attempts = retry_attempts
        self.retry_min_backoff_s = retry_min_backoff_s
        self.retry_max_backoff_s = retry_max_backoff_s
        self._clock = clock
        self._sleep = sleep
        self._entries: OrderedDict[str, CacheEntry[T]] = OrderedDict()
        self._lock = threading.Lock()  # guards _entries and _key_locks
        self._key_locks: dict[str, threading.Lock] = {}

    # -- public ------------------------------------------------------------

    def get_or_load(self, key: str, loader: Callable[[], T]) -> T:
        """Cached value for ``key``; on miss/expiry, exactly one caller
        runs ``loader`` (with retries) while others wait for the result."""
        hit = self._fresh(key)
        if hit is not None:
            return hit.data
        key_lock = self._key_lock(key)
        with key_lock:  # single-flight: one loader per key
            hit = self._fresh(key)  # re-check after acquiring
            if hit is not None:
                return hit.data
            data = self._load_with_retry(loader)
            with self._lock:
                self._entries[key] = CacheEntry(self._clock(), data)
                self._entries.move_to_end(key)
                while len(self._entries) > self.max_entries:
                    self._entries.popitem(last=False)
            return data

    def peek(self, key: str) -> T | None:
        """Cached value without loading, TTL-checked; None on miss."""
        hit = self._fresh(key)
        return hit.data if hit is not None else None

    def invalidate(self, key: str) -> None:
        with self._lock:
            self._entries.pop(key, None)

    def invalidate_matching(self, substring: str) -> None:
        """Drop every key containing ``substring`` — the reference's
        ``invalidateTable`` listing sweep
        (/root/reference/src/glue-table-cache.ts:206-215)."""
        with self._lock:
            for k in [k for k in self._entries if substring in k]:
                del self._entries[k]

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()

    def __len__(self) -> int:
        with self._lock:
            return len(self._entries)

    def keys(self) -> list[str]:
        with self._lock:
            return list(self._entries)

    # -- internals -----------------------------------------------------------

    def _fresh(self, key: str) -> CacheEntry[T] | None:
        with self._lock:
            entry = self._entries.get(key)
            if entry is None:
                return None
            if self._clock() - entry.timestamp > self.ttl_s:
                del self._entries[key]
                return None
            self._entries.move_to_end(key)
            return entry

    def _key_lock(self, key: str) -> threading.Lock:
        with self._lock:
            return self._key_locks.setdefault(key, threading.Lock())

    def _load_with_retry(self, loader: Callable[[], T]) -> T:
        last: Exception | None = None
        for attempt in range(self.retry_attempts):
            try:
                return loader()
            except Exception as exc:  # noqa: BLE001 — mirrors async-retry
                if getattr(exc, "should_bail", False) or getattr(
                    exc, "status_code", None
                ) in (400, 403):
                    raise  # bail: no retry on 400/403
                last = exc
                if attempt + 1 < self.retry_attempts:
                    self._sleep(
                        random.uniform(
                            self.retry_min_backoff_s, self.retry_max_backoff_s
                        )
                    )
        assert last is not None
        raise last


def table_cache_key(database: str, table: str) -> str:
    """Same key shape as the reference (``db_tbl``,
    /root/reference/src/glue-table-cache.ts:150-157)."""
    return f"{database}_{table}"


def listing_cache_key(location: str, partition_key_names: list[str]) -> str:
    """``s3path:keys`` (/root/reference/src/glue-table-cache.ts:416-430)."""
    return f"{location}:{','.join(partition_key_names)}"
