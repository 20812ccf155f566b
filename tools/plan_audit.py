"""Generate PLANS.md: annotated physical plans for the flagship queries.

The properties that matter at 100 TB are plan properties — filters
reaching the scan, dimension-only broadcasts, equi-join (not
nested-loop) candidate generation, map-side partial aggregation,
whole-stage codegen coverage. tests/test_plans.py pins them as
assertions; this tool renders the actual plans so a reviewer can see
them without running Spark.

Usage: python tools/plan_audit.py [sf_dir] > plan_audit.log
Writes PLANS.md at the repo root.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_spark.plans.explain import physical_plan
from map_reduce_spark.registry import load_all
from map_reduce_spark.session import get_spark

# query -> the plan property a reviewer should check
AUDIT = {
    "q1_pricing_summary": (
        "scan -> filter -> hash agg: ReadSchema prunes lineitem to 7 of 16 "
        "columns; partial_ aggregates before the single shuffle (map-side "
        "combine); one Exchange total."
    ),
    "q6_forecast_revenue": (
        "all three predicates in PushedFilters at the parquet scan; "
        "whole-stage codegen covers filter+project+agg."
    ),
    "q3_shipping_priority": (
        "customer/orders/lineitem join with NO forced broadcast of the "
        "scale-linear tables (AQE decides at runtime); filters pushed to "
        "all three scans."
    ),
    "q5_local_supplier_volume": (
        "region -> nation -> supplier dimension chain collapses to "
        "BroadcastHashJoins; the lineitem fact table is never shuffled for "
        "a dim join."
    ),
    "dedup_minhash_lsh": (
        "banded signature equi-join (SortMergeJoin/ShuffledHashJoin on "
        "band+sig) generates candidates; no CartesianProduct or "
        "BroadcastNestedLoopJoin anywhere."
    ),
    "dedup_embedding_lsh_hi": (
        "sketch band equi-join on (band, val) — hash join, "
        "shuffle-partitionable at 10^9 vectors; exact verify only on "
        "surviving candidates."
    ),
    "sim_knn_bruteforce": (
        "probe set broadcast against the corpus scan (corpus never "
        "shuffles for the join); single window shuffle for per-probe "
        "top-k."
    ),
    "topk_orders_by_price": (
        "TakeOrderedAndProject — per-partition top-k then merge, no full "
        "sort of the table."
    ),
    "join_salted_customer_orders": (
        "skew-safe join: salt explodes the hot key range so no single "
        "reducer owns a hot key's whole partition."
    ),
    "agg_exact_percentiles": (
        "fully-lazy distributed rank-pick: histogram + bucket-count "
        "cumulative windows partitioned by group; row_number only inside "
        "the <=2 target buckets; no collect whose size grows with n."
    ),
    "window_rank_dense_ntile": (
        "distributed two-level global rank: the only unpartitioned window "
        "runs on the B-row bucket table; per-bucket row_number + broadcast "
        "offsets give the global position without a single-partition sort."
    ),
    "sim_knn_ivfpq": (
        "IVF-PQ composition: candidates from a hash equi-join on cell "
        "(never an all-pairs scan); ADC scoring over 8-byte codes; exact "
        "rerank joins raw vectors back by key for only probes x rerank rows."
    ),
    "dedup_ngram_jaccard_pairs": (
        "the heaviest Spark query at sf3 (76 s vs DuckDB 913 s): shingle "
        "inverted-index self-join on the shingle hash — equi-join candidate "
        "generation, never CartesianProduct; per-pair intersection counts "
        "from a hash aggregate with map-side partial_count."
    ),
    "rag_chunk_tfidf_search": (
        "r10 capped retrieval: the candidate side of the inverted-index "
        "join is the impact-pruned postings frame (<= 1000/token); probe "
        "side broadcast at fixture scale (the large-probe regime inverts "
        "the broadcast onto the cap-collapsed candidate frame and "
        "pre-partitions probes by probe_uid so the (probe, cand) "
        "aggregate + top-k window run exchange-free — pinned in "
        "tests/test_retrieval.py)."
    ),
    "basket_brand_rules_pct": (
        "bitmask two-level aggregate: lineitem -> broadcast-joined brand "
        "index -> per-order bit_or mask (8-byte fully-combining "
        "aggregate, partial_bit_or before the single order exchange) -> "
        "count per distinct mask -> mask-grain pair/item explosion. "
        "Nothing after the mask count is corpus-sized."
    ),
    "dedup_duplicate_clusters": (
        "cluster edges = exact-duplicate STAR edges (fingerprint groups, "
        "linear in group size) UNION the DF-capped verified pair index; "
        "the fixpoint rounds shuffle only the label side against the "
        "v-hash-partitioned persisted edges."
    ),
    "doc_curation_manifest": (
        "end-to-end per-doc verdict: every component index joins back to "
        "documents by doc_id equi-join (hash-partitionable at corpus "
        "scale); no component triggers a corpus-wide cross join or an "
        "unpartitioned window."
    ),
    "q19ish_disjunctive_revenue": (
        "OR-of-ANDs spanning both join sides: Catalyst derives the "
        "single-side residuals — the brand/size disjunction pushed to the "
        "part scan, the l_quantity envelope pushed to the lineitem scan — "
        "before the join; the full disjunction evaluates as the join "
        "filter."
    ),
    "q21ish_sole_return_suppliers": (
        "EXISTS/NOT-EXISTS decorrelated into aggregation: distinct "
        "(order, supplier, saw-R) pair reduction with map-side "
        "partial_max (no Expand from countDistinct), then plain "
        "count/sum/max per order; top-20 via TakeOrderedAndProject."
    ),
    "q13ish_order_count_distribution": (
        "LEFT OUTER join keeps zero-order customers (predicate in the "
        "join condition, pushed to the orders scan); custkey agg reuses "
        "the join partitioning; second agg reduces to O(max orders per "
        "customer) groups."
    ),
    "doc_global_shuffle": (
        "deterministic training-order permutation: md5-hash shard deal, "
        "positions from row_number windows partitioned BY SHARD — the "
        "permutation math sorts only within-shard (one exchange on "
        "shard); the trailing global orderBy is the oracle-gate "
        "presentation sort, dropped by the partitionBy(shard) writer "
        "at scale."
    ),
    "events_anomaly_zscore": (
        "per-type (mean, stddev) reduced to a broadcast stats row (5 "
        "groups, map-side combined) joined back map-side — no event row "
        "shuffles, vs the naive 5-partition window over every event."
    ),
    "doc_chunk_for_rag": (
        "zero-shuffle chunk explosion: tokenize + start-offset "
        "sequence/posexplode all inside whole-stage codegen; no Exchange "
        "before the presentation sort; end-anchored final start is plain "
        "array arithmetic, not a join."
    ),
    "doc_mixture_sample": (
        "rates derived in-plan: language counts reduce to a "
        "broadcast-sized inventory, the 1-row budget broadcasts back "
        "(whitelisted scalar BroadcastNestedLoopJoin), and the corpus "
        "side is one scan + map-side md5-deal filter — zero corpus "
        "shuffles."
    ),
    "graph_pagerank": (
        "broadcast-ranks regime: the cached edge+degree frame is "
        "HashPartitioning(dst); each of the 5 unrolled rounds is a "
        "BroadcastHashJoin (node-sized rank frame broadcast) + a "
        "partial/final sum that reuses the cache partitioning — ZERO "
        "live Exchanges outside the final orderBy. All arithmetic is "
        "bigint (pr DIV outdeg), so no float expression anywhere."
    ),
    "graph_triangle_count": (
        "degree-ordered orientation, broadcast regime gated on the "
        "MEASURED distinct edge count (r9 deferred builder — see the "
        "hand-annotated section below): edges build array-side from "
        "ONE lineitem scan (quantity filter in PushedFilters — ~12% "
        "of rows reach the basket groupBy); the node-sized rank frame "
        "and the oriented edge set broadcast (BroadcastHashJoin), so "
        "the wedge stream — the largest frame in the algorithm — "
        "never crosses an Exchange; corners explode once into a "
        "map-side-combinable count."
    ),
    "events_rolling_7d_actives": (
        "r8 interval sweep: one (day, user) distinct, one user-keyed "
        "window whose run aggregate reuses the window's "
        "HashPartitioning(user_id) (grouping keys are a superset — no "
        "extra Exchange), then calendar-bounded deltas; the only "
        "unpartitioned window runs on the days-in-range frame, the "
        "documented bounded-prefix pattern. No 7x fanout, no second "
        "dedup exchange."
    ),
    "layout_zorder_stats": (
        "one projection computes quantize + Morton interleave as pure "
        "bigint expressions inside WholeStageCodegen (no UDF); the "
        "dimension extrema ride in as a whitelisted 1-row broadcast; "
        "the bucket aggregate is map-side combinable with "
        "calendar-free bounded output (256 buckets)."
    ),
    "events_gap_fill": (
        "daily aggregate -> per-user bounds -> sequence+explode grid "
        "-> left join observations -> last(ignorenulls) fill window; "
        "grid fan-out is calendar-bounded, and the join + window both "
        "key on user_id."
    ),
    "agg_heavy_hitters": (
        "r9 narrow regime (the sampled vocabulary-width probe picks "
        "it on every fixture scale): ONE tokenize pass into a "
        "map-side-combined type-grain hash aggregate (partial_count "
        "before the only data Exchange), total = sum over the "
        "persisted type-grain frame riding a whitelisted 1-row "
        "broadcast. No Python in the plan; the Misra-Gries "
        "mapInPandas path is the wide-vocabulary fallback "
        "(mg_heavy_hitters, regime-equality pinned in pytest)."
    ),
    "ivm_orders_daily_totals": (
        "base aggregate + SIGNED delta aggregate joined full-outer on "
        "the group key; all change classes expand ARRAY-side from ONE "
        "fact scan (explode of per-row contribution arrays), so the "
        "maintenance cost is O(changes) + a groups-sized join — no "
        "second scan of orders for the deltas."
    ),
    "doc_shard_rendezvous": (
        "one narrow projection computes all N_SHARDS md5 scores + "
        "array_max argmax inside WholeStageCodegen (no UDF, no "
        "shuffle before the 8-row shard census aggregate)."
    ),
    "events_pattern_detect": (
        "one shuffle keyed by user_id; collect_list + array_sort "
        "builds the ordered type string per user and both regex "
        "patterns evaluate in the same projection — sequence "
        "matching with no self-joins."
    ),
}

HIGHLIGHT = re.compile(
    r"PushedFilters: \[[^\]]+\]|ReadSchema: [^\n]+|BroadcastHashJoin|"
    r"SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|"
    r"CartesianProduct|TakeOrderedAndProject|Exchange [a-z]+partitioning|"
    r"partial_[a-z_]+|WholeStageCodegen \(\d+\)"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    specs = load_all()
    out = [
        "# PLANS — physical-plan audit of the flagship queries",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}` "
        "(re-run any time; plans are deterministic for a fixed Spark "
        "version and data layout). Each section states the property to "
        "check, lists the plan lines that prove it, then the full "
        "`explain('formatted')` output. The same properties are pinned "
        "as assertions in `tests/test_plans.py` and "
        "`tests/test_bucketed.py`.",
        "",
    ]
    for name, note in AUDIT.items():
        plan = physical_plan(specs[name].builder(spark, sf_dir))
        hits = sorted(set(m.group(0) for m in HIGHLIGHT.finditer(plan)))
        out += [
            f"## {name}",
            "",
            f"**Check:** {note}",
            "",
            "**Plan evidence:** " + "; ".join(f"`{h}`" for h in hits[:12]),
            "",
            "```",
            plan.strip()[:6000],
            "```",
            "",
        ]
        print(f"audited {name}", file=sys.stderr)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Hand-annotated sections survive regeneration: any *.md under
    # tools/plan_notes/ is appended verbatim (r9 — the regenerator had
    # silently dropped the hand-written triangle deep-dive).
    notes_dir = os.path.join(root, "tools", "plan_notes")
    if os.path.isdir(notes_dir):
        for fn in sorted(os.listdir(notes_dir)):
            if fn.endswith(".md"):
                with open(os.path.join(notes_dir, fn)) as nf:
                    out += [nf.read().rstrip(), ""]
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md", file=sys.stderr)


if __name__ == "__main__":
    main()
