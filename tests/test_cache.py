"""Cache-layer semantics, mirroring the reference's unit suite
(/root/reference/test/glue-table-cache.test.ts): TTL expiry (42-67),
single-flight, retry with 400/403 bail (266-275), LRU bounds, and the
proxy-address rewrite (config test, glue-table-cache.ts:54-65,235-238).
"""

from __future__ import annotations

import threading
import time

import pytest

from glue_table_cache_spark.cache import (
    LruTtlCache,
    listing_cache_key,
    table_cache_key,
)
from glue_table_cache_spark.errors import RetryableAPIError


class FakeClock:
    def __init__(self) -> None:
        self.t = 1000.0

    def __call__(self) -> float:
        return self.t


def test_ttl_expiry_reloads():
    clock = FakeClock()
    cache = LruTtlCache(ttl_ms=60_000, clock=clock, sleep=lambda s: None)
    calls = {"n": 0}

    def loader():
        calls["n"] += 1
        return f"v{calls['n']}"

    assert cache.get_or_load("k", loader) == "v1"
    clock.t += 59  # within TTL
    assert cache.get_or_load("k", loader) == "v1"
    clock.t += 2  # past TTL
    assert cache.get_or_load("k", loader) == "v2"
    assert calls["n"] == 2


def test_clear_forces_reload():
    cache = LruTtlCache(sleep=lambda s: None)
    calls = {"n": 0}

    def loader():
        calls["n"] += 1
        return calls["n"]

    cache.get_or_load("k", loader)
    cache.clear()
    cache.get_or_load("k", loader)
    assert calls["n"] == 2


def test_lru_bound_evicts_oldest():
    cache = LruTtlCache(max_entries=2, sleep=lambda s: None)
    cache.get_or_load("a", lambda: 1)
    cache.get_or_load("b", lambda: 2)
    cache.get_or_load("a", lambda: 1)  # refresh a's recency
    cache.get_or_load("c", lambda: 3)  # evicts b
    assert sorted(cache.keys()) == ["a", "c"]


def test_single_flight_one_loader_for_concurrent_callers():
    cache = LruTtlCache(sleep=lambda s: None)
    calls = {"n": 0}
    gate = threading.Event()

    def slow_loader():
        calls["n"] += 1
        gate.wait(timeout=5)
        return "shared"

    results = []

    def worker():
        results.append(cache.get_or_load("k", slow_loader))

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    time.sleep(0.2)  # let every thread queue on the key lock
    gate.set()
    for t in threads:
        t.join(timeout=5)
    assert results == ["shared"] * 8
    assert calls["n"] == 1


def test_retry_three_times_then_raise():
    cache = LruTtlCache(retry_attempts=3, sleep=lambda s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        raise RetryableAPIError("boom", status_code=500)

    with pytest.raises(RetryableAPIError):
        cache.get_or_load("k", flaky)
    assert calls["n"] == 3


def test_retry_recovers_on_second_attempt():
    cache = LruTtlCache(retry_attempts=3, sleep=lambda s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RetryableAPIError("transient", status_code=500)
        return "ok"

    assert cache.get_or_load("k", flaky) == "ok"
    assert calls["n"] == 2


@pytest.mark.parametrize("code", [400, 403])
def test_bail_no_retry_on_4xx(code):
    """Reference: 400/403 bail immediately
    (/root/reference/src/glue-table-cache.ts:178-196)."""
    cache = LruTtlCache(retry_attempts=3, sleep=lambda s: None)
    calls = {"n": 0}

    def denied():
        calls["n"] += 1
        raise RetryableAPIError("denied", status_code=code)

    with pytest.raises(RetryableAPIError):
        cache.get_or_load("k", denied)
    assert calls["n"] == 1


def test_error_not_cached():
    cache = LruTtlCache(retry_attempts=1, sleep=lambda s: None)
    calls = {"n": 0}

    def once_bad():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RetryableAPIError("bad", status_code=500)
        return "good"

    with pytest.raises(RetryableAPIError):
        cache.get_or_load("k", once_bad)
    assert cache.get_or_load("k", once_bad) == "good"


def test_key_shapes_match_reference():
    assert table_cache_key("db", "tbl") == "db_tbl"
    assert listing_cache_key("s3://b/p", ["y", "m"]) == "s3://b/p:y,m"


def test_proxy_address_rewrite(spark, store):
    """s3:// → proxy prefix in materialized file lists
    (/root/reference/src/glue-table-cache.ts:235-238).  Exercised via
    the engine's _proxy on a fake listing."""
    from glue_table_cache_spark.config import EngineConfig
    from glue_table_cache_spark.engine import GlueSparkEngine

    engine = GlueSparkEngine(
        spark, store, EngineConfig(proxy_address="http://localhost:9000")
    )
    # config normalizes the trailing slash, as the reference does
    assert engine.config.proxy_address == "http://localhost:9000/"
    out = engine._proxy(["s3://bucket/key/a.parquet", "/local/b.parquet"])
    assert out == [
        "http://localhost:9000/bucket/key/a.parquet",
        "/local/b.parquet",
    ]


def test_invalid_proxy_address_rejected():
    from glue_table_cache_spark.config import EngineConfig

    with pytest.raises(ValueError):
        EngineConfig(proxy_address="localhost-no-scheme")
