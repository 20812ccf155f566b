"""Property tests for the Bloom runtime-filter join
(operators/runtime_filter.py).

The oracle gate proves end-to-end transparency (bloom + exact join ==
plain join). These pin the filter-level invariants: zero false
negatives, a real pruning effect, a bounded false-positive rate, and
the bitmap's bounded size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_spark.operators.runtime_filter import (
    BLOOM_BITS,
    BLOOM_SEEDS,
    bloom_bitmap,
    bloom_prefilter,
)
from map_reduce_spark.sources import load_table


def _build_and_probe(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    keys = orders.join(
        customer.filter(F.col("c_mktsegment") == "BUILDING").select(
            "c_custkey"
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("o_orderkey")
    probe = lineitem.select("l_orderkey")
    return keys, probe


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every probe row whose key IS in the build set survives."""
    keys, probe = _build_and_probe(spark, sf_dir)
    bitmap = bloom_bitmap(keys, "o_orderkey")
    surv = {
        r["l_orderkey"]
        for r in bloom_prefilter(probe, "l_orderkey", bitmap)
        .select("l_orderkey")
        .distinct()
        .collect()
    }
    build = {r["o_orderkey"] for r in keys.collect()}
    probe_keys = {r["l_orderkey"] for r in probe.distinct().collect()}
    true_matches = probe_keys & build
    assert true_matches <= surv, "bloom dropped a true match"


def test_bloom_prunes_and_bounds_false_positives(spark, sf_dir):
    """The filter removes most non-matching keys: FP rate among
    non-members stays under 1% at this load factor (~600 keys in
    2^20 bits, k=2 -> expected FP ~1e-6)."""
    keys, probe = _build_and_probe(spark, sf_dir)
    bitmap = bloom_bitmap(keys, "o_orderkey")
    surv = {
        r["l_orderkey"]
        for r in bloom_prefilter(probe, "l_orderkey", bitmap)
        .select("l_orderkey")
        .distinct()
        .collect()
    }
    build = {r["o_orderkey"] for r in keys.collect()}
    probe_keys = {r["l_orderkey"] for r in probe.distinct().collect()}
    non_members = probe_keys - build
    fps = len(surv - build)
    assert len(non_members) > 0  # the test is vacuous otherwise
    assert fps / len(non_members) < 0.01
    # and the pass is a real prune: most non-members are gone
    assert len(surv) < len(probe_keys)


def test_bitmap_is_bounded(spark, sf_dir):
    """The bitmap never exceeds its packed capacity nor 2 words per
    member — it is broadcastable at any build-side cardinality."""
    keys, _ = _build_and_probe(spark, sf_dir)
    bitmap = bloom_bitmap(keys, "o_orderkey").collect()
    n_keys = keys.distinct().count()
    assert len(bitmap) <= min(BLOOM_BITS // 64, len(BLOOM_SEEDS) * n_keys)
    words = [r["word_idx"] for r in bitmap]
    assert all(0 <= w < BLOOM_BITS // 64 for w in words)
    assert len(set(words)) == len(words)  # one row per word, packed
