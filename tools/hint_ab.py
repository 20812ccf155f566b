"""Price the merge-hint policy at small scale (r11 verdict item 4).

r11 pinned ``hint("merge")`` UNCONDITIONALLY on every join against a
session-cached corpus-sized frame (the sf10 broadcast-OOM fix); r12
replaced those pins with the footer-stat SIZE GATE of plans/hints.py.
This tool measures what the policies cost where they differ — small
corpora, where the gate leaves AQE free to broadcast — by running
the hinted family under MRS_MERGE_HINT_MODE=gated vs =unconditional
in alternating fresh sessions (A/B interleaved per scale, min-of-N
per mode) at sf0.1 and sf1.

Expected shape: gated <= unconditional at small sf (broadcast wins
restored), identical at sf10 (gate closed -> same plans; the r12
sweep artifact covers that end). The artifact records per-query and
family totals per mode.

Usage:
  python tools/hint_ab.py [--sf-dirs /root/testdata/sf0.1 /tmp/sf1]
      [--reps 2] [--out HINT_AB_r12.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HINTED_FAMILY = [
    "dedup_ngram_jaccard_pairs",
    "dedup_jaccard_df_capped",
    "dedup_duplicate_clusters",
    "dedup_cluster_keep_best",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_embedding_lsh_hi",
    "dedup_semantic_clusters",
    "dedup_incremental_batch",
    "quality_split_drift",
]

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from map_reduce_spark.plans.transient import release_transient
from map_reduce_spark.registry import load_all
from map_reduce_spark.session import get_spark

spark = get_spark("hint-ab")
specs = load_all()
times = {{}}
for name in {names!r}:
    t0 = time.monotonic()
    specs[name].builder(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
    times[name] = round(time.monotonic() - t0, 3)
    release_transient()
print("HINTAB " + json.dumps(times))
"""


def run_once(repo: str, sf_dir: str, mode: str) -> dict[str, float]:
    env = dict(os.environ, MRS_MERGE_HINT_MODE=mode)
    code = RUNNER.format(repo=repo, names=HINTED_FAMILY, sf_dir=sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("HINTAB "):
            return json.loads(line[len("HINTAB "):])
    raise RuntimeError(out.stderr[-2000:])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dirs", nargs="*", default=["/root/testdata/sf0.1", "/tmp/sf1"]
    )
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="HINT_AB_r12.json")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    result: dict = {"queries": HINTED_FAMILY, "reps": args.reps, "scales": {}}
    for sf_dir in args.sf_dirs:
        per_mode: dict[str, dict[str, float]] = {}
        # interleaved A/B: g, u, g, u ... so drift hits both modes
        for rep in range(args.reps):
            for mode in ("gated", "unconditional"):
                t = run_once(repo, sf_dir, mode)
                cur = per_mode.setdefault(mode, {})
                for k, v in t.items():
                    cur[k] = min(cur.get(k, v), v)
                print(f"{sf_dir} rep{rep} {mode}: total "
                      f"{round(sum(t.values()), 2)}s", flush=True)
        rec = {
            m: {"queries": q, "total": round(sum(q.values()), 3)}
            for m, q in per_mode.items()
        }
        rec["gated_over_unconditional"] = round(
            rec["gated"]["total"] / rec["unconditional"]["total"], 3
        )
        result["scales"][sf_dir] = rec
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
