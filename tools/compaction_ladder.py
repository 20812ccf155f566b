"""Probe-cost decay vs append-epoch count, and the compaction floor
(r11 verdict item 6).

Every ``saveAsTable(mode="append")`` on a bucketed table adds one
file per bucket, so N ingest epochs leave N files per bucket; bucket
scans must open/merge every file, and probe plans degrade with file
count. This tool measures that decay on BOTH maintained indexes
(dedup fingerprint/postings and ANN cells), then runs the
OPTIMIZE-style bucket-local rewrite (``DedupIngestIndex.compact`` /
``SimIngestIndex.compact``) and shows probe time returning to the
compacted floor. Deletions are folded in before the final rung so
compaction also reclaims tombstoned rows, not just merges files.

Methodology: one FIXED probe batch per index, timed (min of 2) at a
ladder of epoch counts, so every rung prices the same query against
a fatter file layout; file counts read from the warehouse directory.

Usage:
  python tools/compaction_ladder.py [--sf-dir /tmp/sf10]
      [--epochs 20] [--out COMPACTION_LADDER_r12.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _files(spark, table: str) -> int:
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    return len(glob.glob(f"{warehouse}/{table}/**/part-*", recursive=True))


def _timed(fn, reps: int = 2) -> float:
    best = None
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--out", default="COMPACTION_LADDER_r12.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from map_reduce_spark.functions.dedup_ingest import DedupIngestIndex
    from map_reduce_spark.functions.sim_ingest import SimIngestIndex
    from map_reduce_spark.functions.similarity import N_PROBE
    from map_reduce_spark.session import get_spark
    from map_reduce_spark.sources import load_table

    spark = get_spark("compaction-ladder")
    rungs = sorted({1, args.epochs // 4, args.epochs // 2, args.epochs})
    result: dict = {"sf_dir": args.sf_dir, "epochs": args.epochs, "rungs": rungs}

    # ---- dedup index ----------------------------------------------------
    docs = load_table(spark, args.sf_dir, "documents").select("doc_id", "text")
    boot = docs.filter(F.col("doc_id") % 4 != 3)
    probe_b = docs.filter(F.col("doc_id") % 199 == 7).limit(2000)
    idx = DedupIngestIndex(spark, "compact_ladder_dedup")
    t0 = time.monotonic()
    idx.bootstrap(boot)
    dedup = {"bootstrap_sec": round(time.monotonic() - t0, 3), "ladder": []}
    for e in range(1, args.epochs + 1):
        batch = docs.filter(
            (F.col("doc_id") % 4 == 3) & (F.col("doc_id") % args.epochs == e - 1)
        )
        idx._append_delta(batch, "append")
        if e in rungs:
            rec = {
                "epochs": e,
                "post_files": _files(spark, idx.post_t),
                "probe_sec": _timed(lambda: idx.probe(probe_b).count()),
            }
            dedup["ladder"].append(rec)
            print(f"dedup {json.dumps(rec)}", flush=True)
    idx.delete(docs.filter(F.col("doc_id") % 40 == 0).select("doc_id"))
    dedup["probe_sec_after_delete"] = _timed(lambda: idx.probe(probe_b).count())
    t0 = time.monotonic()
    idx.compact()
    dedup["compact_sec"] = round(time.monotonic() - t0, 3)
    dedup["post_files_after_compact"] = _files(spark, idx.post_t)
    dedup["probe_sec_after_compact"] = _timed(
        lambda: idx.probe(probe_b).count()
    )
    result["dedup"] = dedup
    print(json.dumps(dedup), flush=True)

    # ---- ANN cells index ------------------------------------------------
    emb = load_table(spark, args.sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    boot_e = emb.filter(F.col("vec_id") % 4 != 3)
    probe_e = emb.filter(F.col("vec_id") % 199 == 7).limit(500)
    sidx = SimIngestIndex(spark, "compact_ladder_sim")
    t0 = time.monotonic()
    sidx.bootstrap(boot_e)
    sim = {"bootstrap_sec": round(time.monotonic() - t0, 3), "ladder": []}
    for e in range(1, args.epochs + 1):
        batch = emb.filter(
            (F.col("vec_id") % 4 == 3) & (F.col("vec_id") % args.epochs == e - 1)
        )
        sidx._append_cells(batch, "append")
        if e in rungs:
            rec = {
                "epochs": e,
                "cells_files": _files(spark, sidx.cells_t),
                "probe_sec": _timed(
                    lambda: sidx.probe(probe_e, N_PROBE).count()
                ),
            }
            sim["ladder"].append(rec)
            print(f"sim {json.dumps(rec)}", flush=True)
    sidx.delete(emb.filter(F.col("vec_id") % 40 == 0).select("vec_id"))
    sim["probe_sec_after_delete"] = _timed(
        lambda: sidx.probe(probe_e, N_PROBE).count()
    )
    t0 = time.monotonic()
    sidx.compact()
    sim["compact_sec"] = round(time.monotonic() - t0, 3)
    sim["cells_files_after_compact"] = _files(spark, sidx.cells_t)
    sim["probe_sec_after_compact"] = _timed(
        lambda: sidx.probe(probe_e, N_PROBE).count()
    )
    result["sim"] = sim
    print(json.dumps(sim), flush=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
