"""Result cache TTL/read-through semantics + the PulseEngine facade."""

from __future__ import annotations

import datetime as dt

from currency_market_pulse_spark.plans.cache import ResultCache


def test_ttl_expiry_and_readthrough():
    t = [0.0]
    cache = ResultCache(ttl_s=60.0, clock=lambda: t[0])
    calls = []

    def compute():
        calls.append(1)
        return ["result"]

    key = ResultCache.key(1, 2, "EUR", "GBP")
    assert key == "1-2-EUR-GBP"
    assert cache.get_or_compute(key, compute) == ["result"]
    assert cache.get_or_compute(key, compute) == ["result"]
    assert len(calls) == 1          # second call served from cache
    t[0] = 61.0
    assert cache.get_or_compute(key, compute) == ["result"]
    assert len(calls) == 2          # TTL expired -> recomputed


def test_lru_bound():
    cache = ResultCache(ttl_s=60.0, max_entries=2)
    cache.put("a", 1); cache.put("b", 2); cache.put("c", 3)
    assert cache.get("a") is None   # evicted
    assert cache.get("b") == 2 and cache.get("c") == 3


def test_engine_trends_cached(spark):
    from currency_market_pulse_spark.api import PulseEngine
    from currency_market_pulse_spark.sources.catalog import events_as_trades
    from tests.conftest import SF_DIR

    eng = PulseEngine(spark, events_as_trades(spark, SF_DIR))
    args = (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31), "PUR", "USD")
    r1 = eng.trends(*args)
    r2 = eng.trends(*args)
    assert r1 is r2                  # second call is the cached object
    assert eng.cache.hits == 1 and len(r1) > 0
    try:
        eng.trends(None, *args[1:])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "date_from" in str(e)
