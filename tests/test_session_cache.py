"""Session-cache byte budget (r9 verdict item 4): the global LRU
evicts cold index frames once total persisted bytes exceed the
configured budget, and an evicted entry transparently rebuilds on the
next request — so a single long-lived session cannot accumulate
unbounded index caches (the sf10 whole-registry OOM class)."""

from __future__ import annotations

import os


def test_budget_evicts_lru_and_rebuilds(spark, monkeypatch):
    monkeypatch.setenv("MRS_SESSION_CACHE_BUDGET_BYTES", "1")
    from map_reduce_spark.sources.cache import _LRU, session_cached

    calls = {"a": 0, "b": 0}

    @session_cached
    def build_a(spark, sf_dir):
        calls["a"] += 1
        return spark.range(1000).selectExpr("id", "id * 2 AS x")

    @session_cached
    def build_b(spark, sf_dir):
        calls["b"] += 1
        return spark.range(1000).selectExpr("id", "id * 3 AS y")

    try:
        assert build_a(spark, "/bud").count() == 1000
        assert build_b(spark, "/bud").count() == 1000
        # budget of 1 byte: inserting b measured a's materialized
        # bytes over budget and evicted it (b, just touched, is safe)
        assert ("x" in [c for df in _LRU.values() for c in df.columns]) is False
        # evicted entry rebuilds on demand — correctness unaffected
        assert build_a(spark, "/bud").count() == 1000
        assert calls["a"] == 2 and calls["b"] == 1
    finally:
        for key in [k for k in _LRU if k[1] == "/bud"]:
            _LRU.pop(key).unpersist()


def test_generous_budget_keeps_entries_resident(spark, monkeypatch):
    monkeypatch.setenv("MRS_SESSION_CACHE_BUDGET_BYTES", str(8 << 30))
    from map_reduce_spark.sources.cache import _LRU, session_cached

    calls = {"n": 0}

    @session_cached
    def build(spark, sf_dir):
        calls["n"] += 1
        return spark.range(100).selectExpr("id")

    try:
        build(spark, "/bud2").count()
        build(spark, "/bud2").count()
        assert calls["n"] == 1  # memoized, no rebuild under budget
    finally:
        for key in [k for k in _LRU if k[1] == "/bud2"]:
            _LRU.pop(key).unpersist()
