"""Adjudicate the triangle solo-vs-in-sweep gap (r8 verdict item 4).

r8 measured graph_triangle_count at sf3 two ways and got two answers:
solo honest-rebuild min-of-3 = 4.06 s (1.77x paired DuckDB) vs 6.29 s
(2.74x) inside the SF3_STUDY_r08 sweep. The solo iterations were
[7.24, 4.06, 4.40] — so the sweep's 6.29 is not first-run warm-up
(the sweep's own iteration 2 stayed slow); something about running
AFTER the sweep's neighbors (incremental dedup's session-scoped
shingle caches, SemDeDup / k-means training state, merge/rollup
transients) slows the query ~1.5x.

Controlled experiment, one fresh JVM per condition is NOT possible in
a single process, so conditions run in one session in an order that
lets each comparison isolate one variable:

  A. triangle x3 (rebuild mode) in a fresh session  -> solo baseline
  B. the SF3 sweep neighbor set, one pass            -> pollute
  C. triangle x3 under the polluted session          -> the gap, if
     it reproduces
  D. spark.catalog.clearCache() + release_transient,
     then triangle x3                                -> if this
     restores A, the gap is storage/cache pressure; if not, it is
     JVM-heap/JIT state and the sweep number is the honest
     steady-state cost.

Each triangle run releases transients after materializing (honest
rebuild). Paired DuckDB runs once for the ratio context.

Usage:
  python tools/triangle_adjudication.py [--sf-dir /tmp/sf3]
      [--out TRIANGLE_ADJUDICATION_r09.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NEIGHBORS = [
    # the SF3_STUDY_r08 sweep set minus triangle itself, in its order
    "events_rolling_7d_actives",
    "basket_part_association",
    "dedup_incremental_batch",
    "merge_orders_upsert",
    "events_hypertable_rollup",
    "dedup_semdedup_embeddings",
    "ml_kmeans_embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf3")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="TRIANGLE_ADJUDICATION_r09.json")
    args = ap.parse_args()

    import duckdb

    from map_reduce_spark.plans.transient import release_transient
    from map_reduce_spark.registry import load_all
    from map_reduce_spark.session import get_spark

    specs = load_all()
    spark = get_spark("tri-adjudicate")

    def run_triangle(n: int) -> list[float]:
        times = []
        for _ in range(n):
            t0 = time.monotonic()
            specs["graph_triangle_count"].builder(spark, args.sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            times.append(round(time.monotonic() - t0, 3))
            release_transient()
        return times

    result: dict = {"sf_dir": args.sf_dir}

    # A: solo baseline in the fresh session
    result["A_solo_rebuild"] = run_triangle(args.runs)
    print("A", result["A_solo_rebuild"], flush=True)

    # B: pollute with the sweep neighbors (one pass, like the sweep's
    # first iteration; their session-scoped caches persist)
    neigh_times = {}
    for name in NEIGHBORS:
        t0 = time.monotonic()
        specs[name].builder(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        neigh_times[name] = round(time.monotonic() - t0, 3)
        release_transient()
        print("B", name, neigh_times[name], flush=True)
    result["B_neighbors"] = neigh_times

    # C: triangle under the polluted session
    result["C_polluted_rebuild"] = run_triangle(args.runs)
    print("C", result["C_polluted_rebuild"], flush=True)

    # D: clear every cache (session-scoped included) and retry
    spark.catalog.clearCache()
    release_transient()
    result["D_cache_cleared_rebuild"] = run_triangle(args.runs)
    print("D", result["D_cache_cleared_rebuild"], flush=True)

    # storage context: what is cached after the sweep (bytes)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{args.sf_dir}/lineitem.parquet'"
    )
    t0 = time.monotonic()
    con.execute(specs["graph_triangle_count"].oracle_sql).fetchall()
    result["duck_paired_sec"] = round(time.monotonic() - t0, 3)

    a, c, d = (
        min(result["A_solo_rebuild"]),
        min(result["C_polluted_rebuild"]),
        min(result["D_cache_cleared_rebuild"]),
    )
    result["verdict"] = {
        "solo_min": a,
        "polluted_min": c,
        "cleared_min": d,
        "gap_reproduced": c / a > 1.25,
        "clearing_restores": d / a < 1.15,
    }
    print(json.dumps(result["verdict"]), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
