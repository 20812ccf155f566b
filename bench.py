"""Benchmark harness — runs the full query manifest and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Data dir: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Parallelism: local[$SPARK_GRAFT_CPUS] (default 32)

Each query executes fully through the noop sink (no driver-side
result materialization cost) after a warm-up query primes the JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_spark.registry import load_all
from map_reduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def execute(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    specs = load_all()
    spark = get_spark("bench")

    # JVM/codegen warm-up (not measured)
    execute(specs["q6_forecast_revenue"].builder(spark, SF_DIR))

    # Three iterations, report the min: the first run pays one-time
    # codegen/JIT compile, index-cache materialization, and stray
    # ContextCleaner pauses, and this host shows ±30-40% transient
    # noise on sub-second queries; the min over three is the
    # steady-state per-query cost (the number comparable across
    # engines and across rounds).
    timings: dict[str, float] = {}
    for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))):
        for name, spec in specs.items():
            t0 = time.perf_counter()
            execute(spec.builder(spark, SF_DIR))
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "manifest_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_from_dir(SF_DIR),
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
