"""The bench stdout line must ALWAYS parse inside the driver's
2000-byte tail window — BENCH_r01..r03 recorded parsed:null because
the full per-query map overflowed it (memory: driver-harness-quirks)."""

from __future__ import annotations

import json

from bench import trim_line


def _base(timings):
    return {
        "metric": "manifest_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": dict(timings),
        "sf": 0.1,
        "n_queries": len(timings),
    }


def test_trim_keeps_slowest_within_budget():
    timings = {f"query_with_a_rather_long_name_{i:03d}": i / 10 for i in range(80)}
    line = trim_line(_base(timings), timings, budget=1800)
    s = json.dumps(line, separators=(",", ":"))
    assert len(s) <= 1800
    kept = line["queries"]
    assert kept and line["queries_omitted"] == len(timings) - len(kept)
    # the kept set is the slowest ones
    assert min(kept.values()) >= max(
        v for k, v in timings.items() if k not in kept
    )


def test_trim_falls_back_to_empty_map_when_nothing_fits():
    timings = {"x" * 500: 1.0}  # keep=1 alone blows a tiny budget
    line = trim_line(_base(timings), timings, budget=200)
    s = json.dumps(line, separators=(",", ":"))
    assert line["queries"] == {} and line["queries_omitted"] == 1
    assert len(s) <= 250  # compact fallback, never the oversized line


def test_trim_empty_manifest_still_parses():
    line = trim_line(_base({}), {}, budget=1800)
    assert line["queries"] == {} and line["queries_omitted"] == 0
    json.dumps(line)
