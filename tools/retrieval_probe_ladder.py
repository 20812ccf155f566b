"""Probe-load ladder for the retrieval pair (r11 verdict item 8).

The r10/r11 artifacts established the CORPUS-scale story (sublinear
sf1->sf3->sf10 at fixed probe count); this tool measures the PROBE
axis at a fixed corpus: TF-IDF and BM25 at sf3 under ~1x/4x/16x the
registered probe load (probe_doc_mod 150 -> 37 -> 9), plus one rung
under PROBE_BROADCAST_MAX_DOCS (mod chosen so probe docs <= 2000) to
catch the broadcast->shuffle regime switch firing where expected.

Claim under test: with the candidate-postings cap, per-probe work is
bounded by (tokens/probe) x RETRIEVAL_MAX_POSTINGS, so wall clock
should grow ~linearly in probe count once past the fixed index-build
cost — the Lucene-shape serving property. Each rung reports which
regime the plan took (recomputed from the same footer/count gates
the builder uses) so the ladder also documents WHERE the switch
fired.

One session for the whole ladder (indexes session-cached — every
rung prices the SEARCH, not the build; build cost is reported
separately as the first-touch premium). min-of-2 per rung.

Usage:
  python tools/retrieval_probe_ladder.py [--sf-dir /tmp/sf3]
      [--out RETRIEVAL_PROBE_LADDER_r12.json]
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
    ap.add_argument("--sf-dir", default="/tmp/sf3")
    ap.add_argument("--out", default="RETRIEVAL_PROBE_LADDER_r12.json")
    args = ap.parse_args()

    from map_reduce_spark.functions.retrieval import (
        CANDS_BROADCAST_MAX_ROWS,
        PROBE_BROADCAST_MAX_DOCS,
        PROBE_DOC_MOD,
        _bm25_search,
        _tfidf_search,
        chunk_tfidf_cands,
    )
    from map_reduce_spark.plans.transient import release_transient
    from map_reduce_spark.session import get_spark
    from map_reduce_spark.sources.tables import parquet_num_rows

    spark = get_spark("retrieval-probe-ladder")
    n_docs = parquet_num_rows(f"{args.sf_dir}/documents.parquet")
    # broadcast-regime rung: the largest mod keeping probe docs under
    # the gate, then the registered load and 4x/16x multiples of it
    bc_mod = -(-n_docs // PROBE_BROADCAST_MAX_DOCS) + 1
    mods = [bc_mod, PROBE_DOC_MOD, PROBE_DOC_MOD // 4, PROBE_DOC_MOD // 16]
    result: dict = {
        "sf_dir": args.sf_dir,
        "n_docs": n_docs,
        "probe_broadcast_max_docs": PROBE_BROADCAST_MAX_DOCS,
        "registered_mod": PROBE_DOC_MOD,
        "ladder": [],
    }

    # warm the session caches once so rungs price search, not build
    t0 = time.monotonic()
    _tfidf_search(spark, args.sf_dir, PROBE_DOC_MOD).count()
    _bm25_search(spark, args.sf_dir, PROBE_DOC_MOD).count()
    release_transient()
    result["index_build_first_touch_sec"] = round(time.monotonic() - t0, 3)
    n_cands = chunk_tfidf_cands(spark, args.sf_dir).count()
    result["cands_rows"] = n_cands

    for mod in mods:
        n_probe_docs = -(-n_docs // mod)
        if n_probe_docs <= PROBE_BROADCAST_MAX_DOCS:
            regime = "probe-broadcast"
        elif n_cands <= CANDS_BROADCAST_MAX_ROWS:
            regime = "cands-broadcast"
        else:
            regime = "token-shuffle"
        rec = {
            "probe_doc_mod": mod,
            "n_probe_docs": n_probe_docs,
            "load_vs_registered": round(
                n_probe_docs / (-(-n_docs // PROBE_DOC_MOD)), 2
            ),
            "regime": regime,
        }
        for label, fn in (("tfidf", _tfidf_search), ("bm25", _bm25_search)):
            best = None
            for _ in range(2):
                t0 = time.monotonic()
                n = fn(spark, args.sf_dir, mod).count()
                dt = time.monotonic() - t0
                release_transient()
                best = dt if best is None else min(best, dt)
            rec[f"{label}_sec"] = round(best, 3)
            rec[f"{label}_rows"] = n
        result["ladder"].append(rec)
        print(json.dumps(rec), flush=True)

    # linearity summary on the large-probe rungs: sec-per-1x-load,
    # anchored at the registered rung
    big = [r for r in result["ladder"] if r["regime"] != "probe-broadcast"]
    if len(big) >= 2:
        base = big[0]
        result["per_load_ratio"] = {
            f"mod{r['probe_doc_mod']}": round(
                (r["tfidf_sec"] / r["load_vs_registered"])
                / (base["tfidf_sec"] / base["load_vs_registered"]),
                2,
            )
            for r in big
        }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
