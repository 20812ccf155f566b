"""Maintained-index ingest ladder (r8 verdict item 5).

The r8 batch-share ladder (SOLO_STUDY_r08.json) proved the
self-contained ``dedup_incremental_batch`` is dominated by the
existing-side index REBUILD it pays every batch. This tool measures
the maintained-index path (functions/dedup_ingest.py) against that
rebuild on the same corpus, two ways:

1. BATCH-SIZE LADDER at a fixed indexed corpus: per-batch probe cost
   for geometrically growing batch sizes, paired with the
   from-scratch rebuild (``incremental_verdicts``) on the identical
   (existing, batch) split. The design claim is that the maintained
   probe scales DOWN with batch size while the rebuild stays pinned
   to the corpus-sized floor — i.e. per-batch cost became
   batch-proportional.
2. SEQUENTIAL INGEST: a fixed-size batch stream ingested through the
   maintained loop (probe + sink write + delta appends), per-batch
   wall time reported as the corpus grows — the steady-state loop the
   docstring describes.

Honest residual (documented in dedup_ingest.py): the probe still
SCANS the bucketed postings index (columnar, two narrow columns) —
corpus-sized local IO; what it no longer pays is the corpus text
re-tokenize/re-shingle and the full-df corpus-mass shuffle.

Usage:
  python tools/ingest_ladder.py [--sf-dir /tmp/sf1]
      [--batch-sizes 625,1250,2500,5000] [--runs 2]
      [--out INGEST_LADDER_r09.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--batch-sizes", default="625,1250,2500,5000")
    ap.add_argument("--seq-batches", type=int, default=8)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--out", default="INGEST_LADDER_r09.json")
    args = ap.parse_args()
    sizes = [int(s) for s in args.batch_sizes.split(",")]

    from pyspark.sql import functions as F

    from map_reduce_spark.functions.dedup import INCREMENT_MOD
    from map_reduce_spark.functions.dedup_ingest import (
        DedupIngestIndex,
        incremental_verdicts,
    )
    from map_reduce_spark.session import get_spark
    from map_reduce_spark.sources import load_table

    spark = get_spark("ingest-ladder")
    docs = load_table(spark, args.sf_dir, "documents").select("doc_id", "text")
    is_inc = (F.col("doc_id") % INCREMENT_MOD) == 0
    existing = docs.filter(~is_inc)
    pool = docs.filter(is_inc).orderBy("doc_id")
    pool_ids = [r["doc_id"] for r in pool.select("doc_id").collect()]
    result: dict = {
        "sf_dir": args.sf_dir,
        "n_existing": existing.count(),
        "n_pool": len(pool_ids),
        "n_buckets": args.n_buckets,
    }

    idx = DedupIngestIndex(spark, "ladder_ix", n_buckets=args.n_buckets)
    t0 = time.monotonic()
    idx.bootstrap(existing)
    result["bootstrap_sec"] = round(time.monotonic() - t0, 3)
    print(f"bootstrap: {result['bootstrap_sec']}s", flush=True)

    # 1. batch-size ladder at the fixed bootstrapped corpus
    def pool_slice(lo: int, hi: int):
        """Docs at pool positions [lo, hi) as a RANGE predicate on the
        sorted pool ids (pushdown-able; a 5k-literal isin is not)."""
        upper = pool_ids[hi] if hi < len(pool_ids) else pool_ids[-1] + 1
        return pool.filter(
            (F.col("doc_id") >= pool_ids[lo]) & (F.col("doc_id") < upper)
        )

    ladder = []
    for b in sizes:
        batch = pool_slice(0, b)
        probe_times, rebuild_times = [], []
        for _ in range(args.runs):
            t0 = time.monotonic()
            n_probe = idx.probe(batch).count()
            probe_times.append(time.monotonic() - t0)
            t0 = time.monotonic()
            n_rebuild = incremental_verdicts(existing, batch).count()
            rebuild_times.append(time.monotonic() - t0)
        assert n_probe == n_rebuild == b, (n_probe, n_rebuild, b)
        rec = {
            "batch_size": b,
            "probe_sec": round(min(probe_times), 3),
            "rebuild_sec": round(min(rebuild_times), 3),
            "speedup": round(min(rebuild_times) / min(probe_times), 2),
        }
        ladder.append(rec)
        print(json.dumps(rec), flush=True)
    result["batch_size_ladder"] = ladder

    # value cross-check at the smallest point (the ladder is only as
    # good as the pipeline it times)
    b = sizes[0]
    batch = pool_slice(0, b)
    got = [tuple(r) for r in idx.probe(batch).collect()]
    want = [tuple(r) for r in incremental_verdicts(existing, batch).collect()]
    result["crosscheck_rows"] = len(got)
    result["crosscheck_ok"] = got == want
    assert result["crosscheck_ok"], "probe != rebuild on identical split"

    # 2. sequential steady-state ingest (fixed batch size)
    per = max(1, len(pool_ids) // args.seq_batches)
    seq = []
    for k in range(args.seq_batches):
        lo, hi = k * per, min((k + 1) * per, len(pool_ids))
        if lo >= hi:
            break
        batch = pool_slice(lo, hi)
        t0 = time.monotonic()
        idx.ingest(batch).count()
        seq.append(round(time.monotonic() - t0, 3))
        print(f"seq batch {k}: {seq[-1]}s ({hi - lo} docs)", flush=True)
    result["seq_batch_docs"] = per
    result["seq_ingest_sec"] = seq

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
