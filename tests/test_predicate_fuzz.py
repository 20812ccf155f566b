"""Differential predicate fuzzing: random disjunctive filter/join
predicates evaluated by Spark AND DuckDB over the same fixture — the
q19ish shape generalized beyond its fixed constants, so the
pushdown/join machinery is pinned across the predicate space rather
than at one point.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from map_reduce_spark.sources import load_table

BRANDS = [f"Brand#{i}" for i in range(1, 26)]


def _random_clause(rng):
    brand = rng.choice(BRANDS)
    s_lo = rng.randint(1, 40)
    s_hi = rng.randint(s_lo, 50)
    q_lo = rng.randint(1, 40)
    q_hi = rng.randint(q_lo, 50)
    return brand, s_lo, s_hi, q_lo, q_hi


@pytest.mark.parametrize("seed", range(8))
def test_random_disjunctive_predicates_match_duckdb(spark, sf_dir, seed):
    rng = random.Random(seed)
    clauses = [_random_clause(rng) for _ in range(rng.randint(1, 4))]

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    disj = None
    for brand, s_lo, s_hi, q_lo, q_hi in clauses:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        disj = c if disj is None else (disj | c)
    got = joined.filter(disj).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    ).collect()[0]

    sql_disj = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {sl} AND {sh} "
        f"AND l_quantity BETWEEN {ql} AND {qh})"
        for b, sl, sh, ql, qh in clauses
    )
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT count(*) AS n,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey
            WHERE {sql_disj}"""
    ).fetchone()
    assert (got.n, got.revenue) == want, (clauses, got, want)
