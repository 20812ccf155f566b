"""Maintained-index ANN ingest vs rebuild-per-batch (r10 verdict
item 4 — the embedding-serving twin of tools/ingest_ladder.py).

Measures the two ways of serving a continuous vector stream with IVF:

1. MAINTAINED (functions/sim_ingest.py): quantizer trained once at
   bootstrap, cell table persisted bucketed; each batch pays a
   map-only assignment + broadcast probe + batch-sized append.
2. REBUILD: what calling the self-contained ``sim_knn_ivf`` per batch
   amounts to — retrain the quantizer on the as-of corpus, reassign
   the WHOLE corpus to cells, then search. Timed here with the same
   building blocks (train_centroids + full assignment + the identical
   probe plan) so the only difference is maintained state.

Both paths search the identical (as-of corpus, probe set) per epoch at
the same n_probe, and the tool cross-checks their results are equal at
the first step (the quantizers differ — maintained is frozen at
bootstrap, rebuild retrains — so equality is asserted at n_probe =
N_CELLS, where cell structure cannot change the exact top-k).

Usage:
  python tools/sim_ingest_ladder.py [--sf-dir /tmp/sf1]
      [--batches 6] [--out SIM_INGEST_LADDER_r11.json]
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
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--probe-stride", type=int, default=25)
    ap.add_argument("--out", default="SIM_INGEST_LADDER_r12.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from map_reduce_spark.functions.sim_ingest import (
        SimIngestIndex,
        train_centroids,
    )
    from map_reduce_spark.functions.similarity import N_CELLS, N_PROBE
    from map_reduce_spark.session import get_spark
    from map_reduce_spark.sources import load_table

    spark = get_spark("sim-ingest-ladder")
    emb = load_table(spark, args.sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n_total = emb.count()
    # bootstrap = first half by vec_id; stream = second half in
    # args.batches contiguous slices (range predicates push down)
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    half = ids[len(ids) // 2]
    boot = emb.filter(F.col("vec_id") < half)
    stream_ids = ids[len(ids) // 2 :]
    per = max(1, len(stream_ids) // args.batches)

    def batch_frame(k):
        lo = stream_ids[k * per]
        hi = stream_ids[(k + 1) * per] if (k + 1) * per < len(stream_ids) else ids[-1] + 1
        return emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))

    def probes_of(b):
        return b.filter(
            (F.col("vec_id") / 8).cast("long") % args.probe_stride == 0
        )

    result: dict = {
        "sf_dir": args.sf_dir,
        "n_total": n_total,
        "n_bootstrap": len(ids) // 2,
        "batches": args.batches,
        "batch_size": per,
        "n_probe": N_PROBE,
    }

    idx = SimIngestIndex(spark, "sim_ladder_ix")
    t0 = time.monotonic()
    idx.bootstrap(boot)
    result["bootstrap_sec"] = round(time.monotonic() - t0, 3)
    print(f"bootstrap: {result['bootstrap_sec']}s ({len(ids)//2} vecs)", flush=True)

    def rebuild_search(asof, probes):
        """The per-batch cost of NOT maintaining: retrain + assign the
        whole as-of corpus + the same probe plan (bootstrap IS the
        rebuild — training + full assignment with crash-safe table
        cleanup)."""
        tmp = SimIngestIndex(spark, "sim_ladder_rebuild").bootstrap(asof)
        return tmp.probe(probes, N_PROBE).count()

    ladder = []
    asof = boot
    for k in range(args.batches):
        b = batch_frame(k)
        p = probes_of(b)
        t0 = time.monotonic()
        n_maint = idx.ingest(b, p, N_PROBE).count()
        maint = time.monotonic() - t0
        t0 = time.monotonic()
        n_reb = rebuild_search(asof, p)
        reb = time.monotonic() - t0
        assert n_maint == n_reb, (k, n_maint, n_reb)
        rec = {
            "batch": k,
            "asof_vecs": len(ids) // 2 + k * per,
            "maintained_sec": round(maint, 3),
            "rebuild_sec": round(reb, 3),
            "speedup": round(reb / maint, 2) if maint else None,
            "result_rows": n_maint,
        }
        ladder.append(rec)
        print(json.dumps(rec), flush=True)
        asof = asof.unionAll(b)
    result["ladder"] = ladder

    # value cross-check at full probe width (ADVICE r11: the check
    # must exercise the MAINTAINED index, not two fresh bootstraps
    # over the same corpus — those share a plan and are vacuously
    # equal). After the loop, ``idx`` holds the FULL corpus appended
    # epoch-by-epoch under the quantizer frozen at bootstrap; a fresh
    # rebuild over the same corpus trains a DIFFERENT quantizer, so
    # equality is asserted at n_probe = N_CELLS, where cell structure
    # cannot change the exact top-k.
    p = probes_of(batch_frame(args.batches - 1))
    got = sorted(tuple(r) for r in idx.probe(p, N_CELLS).collect())
    reb_idx = SimIngestIndex(spark, "sim_ladder_xchk").bootstrap(emb)
    want = sorted(tuple(r) for r in reb_idx.probe(p, N_CELLS).collect())
    result["crosscheck_rows"] = len(got)
    result["crosscheck_ok"] = got == want
    assert result["crosscheck_ok"], "full-probe maintained != rebuild"

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
