"""Time a subset of registered queries in isolation — same methodology
as bench.py (noop sink, release_transient between queries, min over
N iterations after one warm-up) so a solo number is comparable to the
bench's per-query map.

Usage: python tools/time_queries.py [--sf-dir DIR] [--iters N] name ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_spark.plans.transient import release_transient
from map_reduce_spark.registry import load_all
from map_reduce_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    specs = load_all()
    spark = get_spark("time_queries")

    def execute(df) -> None:
        df.write.format("noop").mode("overwrite").save()
        release_transient()

    # warm-up (JVM/codegen), not measured
    execute(specs["q6_forecast_revenue"].builder(spark, args.sf_dir))

    out: dict[str, float] = {}
    for _ in range(args.iters):
        for name in args.names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            execute(specs[name].builder(spark, args.sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            out[name] = min(out.get(name, dt), dt)
            spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
