"""Skew stress tests (r4 verdict stretch item): the plans that CLAIM
to survive hot keys at 100 TB, measured on synthetic zipf-skewed
inputs instead of design-argued.

Balance is asserted on post-shuffle partition ROW COUNTS (a
deterministic proxy for task runtime on local mode, where wall-clock
per task is scheduler noise): no partition may exceed ~4x the mean of
the non-empty partitions. The unsalted plan fails this exact check on
the same data — also asserted, so the test can't silently pass by
measuring the wrong thing.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from map_reduce_spark.operators.advanced import N_SALTS, salted_join


@pytest.fixture()
def no_coalesce(spark):
    """Observe RAW reducer balance: AQE's small-partition coalescing
    would merge this test's (deliberately tiny) shuffle into one
    partition and hide the per-reducer distribution that matters at
    scale, where partitions are nowhere near the advisory size."""
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    yield
    spark.conf.set(key, prev)


def _partition_counts(df) -> list[int]:
    rows = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    return [r["count"] for r in rows]


def _zipf_tables(spark):
    """1 hot customer holding ~70% of orders + a uniform tail."""
    n_cust, n_orders, hot = 200, 40_000, 28_000
    cust = spark.createDataFrame(
        [(i, f"SEG{i % 5}") for i in range(n_cust)], "c_custkey long, c_mktsegment string"
    )
    orders = spark.range(n_orders).select(
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise(F.col("id") % (n_cust - 1) + 1)
        .alias("o_custkey"),
        (F.col("id") % 997 / 10.0).alias("o_totalprice"),
    )
    return cust, orders


def test_salted_join_balances_hot_key(spark, no_coalesce):
    cust, orders = _zipf_tables(spark)
    counts = [c for c in _partition_counts(salted_join(cust, orders)) if c > 0]
    assert len(counts) > 1, "join collapsed to one partition — nothing measured"
    mean = sum(counts) / len(counts)
    assert max(counts) <= 4 * mean, (
        f"salted join still skewed: partitions {sorted(counts, reverse=True)[:5]} "
        f"vs mean {mean:.0f}"
    )


def test_unsalted_join_fails_the_same_check(spark, no_coalesce):
    """Control: the plain shuffle join on the same data concentrates
    the hot key on one reducer — proving the balance assertion above
    actually detects skew (and AQE's skew split stays out of the way
    because the salted plan, not AQE, is what's under test)."""
    cust, orders = _zipf_tables(spark)
    plain = orders.hint("shuffle_hash").join(
        cust, orders.o_custkey == cust.c_custkey
    )
    counts = [c for c in _partition_counts(plain) if c > 0]
    mean = sum(counts) / len(counts)
    assert max(counts) > 4 * mean, (
        "control failed: unsalted join looks balanced, the balance check "
        f"is not discriminating (partitions {sorted(counts, reverse=True)[:5]})"
    )


def test_salted_join_result_equals_plain_join(spark):
    cust, orders = _zipf_tables(spark)
    got = (
        salted_join(cust, orders)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("tp"))
        .orderBy("c_mktsegment")
        .collect()
    )
    want = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("tp"))
        .orderBy("c_mktsegment")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_cc_giant_cluster_converges_and_matches_union_find(spark, tmp_path_factory):
    """Connected components under component-size skew: one giant
    60-doc duplicate cluster (a hot label every propagation round
    must fan in) plus chains and singletons. The result must equal a
    sequential union-find over the engine's OWN pair graph, and the
    giant component must resolve to a single keeper."""
    from map_reduce_spark.functions.dedup import (
        dedup_duplicate_clusters,
        dedup_ngram_jaccard_pairs,
    )

    texts: list[str] = []
    giant = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts += [giant] * 60  # giant star cluster (pairwise identical)
    # chains: A~B, B~C via one-token mutations (transitive, not all-pairs)
    chain_base = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    toks = chain_base.split()
    texts.append(" ".join(toks))
    texts.append(" ".join(toks[:-1] + ["mutated"]))
    texts.append(" ".join(toks[:-2] + ["mutated", "twice"]))
    # singletons with disjoint vocab
    texts += [f"unique{w} solitary{w} document{w} number{w} text{w}" for w in range(20)]

    d = tmp_path_factory.mktemp("skew_cc")
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["skew"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(d / "documents.parquet", index=False)
    sf = str(d)

    # sequential union-find over the engine's own pair graph
    pairs = [(r.doc_a, r.doc_b) for r in dedup_ngram_jaccard_pairs(spark, sf).collect()]
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, set] = {}
    for doc in range(len(texts)):
        comps.setdefault(find(doc), set()).add(doc)
    want = {
        min(v): (len(v), min(v), max(v)) for v in comps.values() if len(v) > 1
    }

    got = {
        r.component_id: (r.n_members, r.keeper_doc, r.max_doc)
        for r in dedup_duplicate_clusters(spark, sf).collect()
    }

    assert got == want, "CC disagrees with union-find on its own pair graph"
    assert max(n for n, _, _ in got.values()) == 60  # the giant survived intact
