"""Runtime-filter join pruning: an explicit Bloom-filter semi-join.

The classic distributed-join optimization (Bloom join / sideways
information passing): before shuffling a 100 TB fact table into a
join, build a compact Bloom filter over the (already-filtered) build
side's keys, broadcast it, and drop probe rows that cannot match —
the shuffle then carries only survivors. Spark's own engine applies
the same idea as InSubqueryExec/runtime bloom filters when thresholds
allow; this operator implements the structure explicitly in DataFrame
algebra (``bloom_filter_agg`` is not exposed as a public SQL function
in this build), so the technique itself is under the correctness
gate: the Bloom pass MUST be semantically transparent — the oracle is
the plain three-table join, and a hash match proves the prefilter
admitted every true match (no false negatives, ever; false positives
are removed by the exact join that follows).

Construction: m = 2^20 bits as 16 Ki packed 64-bit words, k = 2 hash
functions (xxhash64 salted with two seeds). The bitmap lives in a
~16 Ki-row (word_idx -> bits) frame built by ``bit_or`` aggregation —
fully distributed, then broadcast to the probe side; membership is
two broadcast equi-joins on word index plus a bitmask test, all
codegen'd JVM expressions.

Scale notes (100 TB):
- FP budget: n keys over m bits with k=2 gives FP ≈ (1-e^(-kn/m))^2 —
  ~0.3 % at the sf0.1 build-side (~30 k keys). m is a constant here;
  at real scale it is sized from the build-side count (a 1-row agg)
  or the filter is split per key-range partition. The bitmap stays
  kilobytes-to-megabytes either way — always broadcastable, unlike
  the exact distinct-key set.
- The win is shuffle bytes: the probe-side exchange into the exact
  join carries only bloom survivors (matches + FP), not the whole
  fact table. With a 1/5-selective dimension filter upstream, ~80 %
  of probe rows never enter the exchange.
- The exact join after the bloom is NOT redundant: it removes FPs and
  produces the join payload. Bloom-only "joins" (no verify pass) are
  the approximate-membership shape; this operator is the exact one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_table

BLOOM_BITS = 1 << 20  # m: 2^20 bits = 16384 packed longs
BLOOM_SEEDS = (1, 2)  # k = 2 salted xxhash64 probes
_SEGMENT = "BUILDING"

_BLOOM_ORACLE = f"""
    SELECT l.l_returnflag,
           count(*) AS n_items,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = '{_SEGMENT}'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
"""


def _bit_pos(key: Column, seed: int) -> tuple[Column, Column]:
    """(word index, bit mask) of a key's bloom position under one
    salted hash. pmod keeps xxhash64's signed output in [0, m);
    the mask shifts via expr because shiftleft's Python binding only
    takes a literal shift amount."""
    pos = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(BLOOM_BITS))
    word = (pos / 64).cast("long")
    bit = (pos % 64).cast("int")
    mask = F.call_function("shiftleft", F.lit(1).cast("long"), bit)
    return word, mask


def bloom_bitmap(keys: DataFrame, key_col: str) -> DataFrame:
    """Packed bloom bitmap over a key frame: one row per touched
    64-bit word, ``bits`` the OR of every member's masks (both
    seeds set bits in the same array, standard Bloom layout)."""
    per_seed = [
        keys.select(*(lambda w, m: [w.alias("word_idx"), m.alias("mask")])(
            *_bit_pos(F.col(key_col), s)
        ))
        for s in BLOOM_SEEDS
    ]
    allpos = per_seed[0]
    for p in per_seed[1:]:
        allpos = allpos.unionByName(p)
    return allpos.groupBy("word_idx").agg(
        F.bit_or("mask").alias("bits")
    )


def bloom_prefilter(
    probe: DataFrame, probe_key: str, bitmap: DataFrame
) -> DataFrame:
    """Drop probe rows whose key cannot be in the filter: for each
    seed, a broadcast equi-join on the word index plus a mask test.
    Inner joins are correct — a missing word means no member ever
    touched it, so the key is definitely absent."""
    out = probe
    for i, seed in enumerate(BLOOM_SEEDS):
        word, mask = _bit_pos(F.col(probe_key), seed)
        bm = F.broadcast(
            bitmap.withColumnRenamed("word_idx", f"w{i}")
            .withColumnRenamed("bits", f"b{i}")
        )
        out = (
            out.withColumn(f"_w{i}", word)
            .withColumn(f"_m{i}", mask)
            .join(bm, F.col(f"_w{i}") == F.col(f"w{i}"), "inner")
            .filter(F.col(f"b{i}").bitwiseAND(F.col(f"_m{i}")) != 0)
            .drop(f"_w{i}", f"_m{i}", f"w{i}", f"b{i}")
        )
    return out


@register("join_bloom_prefilter", oracle_sql=_BLOOM_ORACLE)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by returnflag for lineitems of BUILDING-segment
    customers, computed through a Bloom-prefiltered join: dimension
    filter -> order keys -> bloom bitmap -> probe-side prune ->
    exact join -> aggregate. The oracle is the plain join, so the
    hash match certifies the prefilter loses no true match.

    Money sums run in DECIMAL(18,4) so the comparison is exact.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    building_orders = orders.join(
        F.broadcast(
            customer.filter(F.col("c_mktsegment") == _SEGMENT).select(
                "c_custkey"
            )
        ),
        F.col("o_custkey") == F.col("c_custkey"),
        "inner",
    ).select("o_orderkey")

    bitmap = bloom_bitmap(building_orders, "o_orderkey")
    survivors = bloom_prefilter(
        lineitem.select(
            "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
        ),
        "l_orderkey",
        bitmap,
    )
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        survivors.join(
            building_orders,
            F.col("l_orderkey") == F.col("o_orderkey"),
            "inner",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))), 2
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )
