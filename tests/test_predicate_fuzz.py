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
def test_random_disjunctive_predicates_match_duckdb(spark, sf_dir, duck, seed):
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
    want = duck.execute(
        f"""SELECT count(*) AS n,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE {sql_disj}"""
    ).fetchone()
    assert (got.n, got.revenue) == want, (clauses, got, want)


AGG_KEYS = ["l_returnflag", "l_linestatus", "l_suppkey % 7", "l_quantity > 25"]


@pytest.mark.parametrize("seed", range(6))
def test_random_groupby_aggregates_match_duckdb(spark, sf_dir, duck, seed):
    """Random key subsets + decomposable aggregates, both engines."""
    rng = random.Random(100 + seed)
    keys = rng.sample(AGG_KEYS, rng.randint(1, 3))

    li = load_table(spark, sf_dir, "lineitem")
    key_cols = [F.expr(k).alias(f"k{i}") for i, k in enumerate(keys)]
    got = {
        tuple(r[f"k{i}"] for i in range(len(keys))): (r.n, r.qty, r.mx)
        for r in li.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.round(F.max("l_extendedprice"), 2).alias("mx"),
        )
        .collect()
    }

    sql_keys = ", ".join(f"{k} AS k{i}" for i, k in enumerate(keys))
    want = {
        tuple(row[: len(keys)]): row[len(keys):]
        for row in duck.execute(
            f"""SELECT {sql_keys}, count(*) AS n,
                       round(sum(l_quantity), 2) AS qty,
                       round(max(l_extendedprice), 2) AS mx
                FROM lineitem
                GROUP BY {", ".join(f"k{i}" for i in range(len(keys)))}"""
        ).fetchall()
    }
    assert got == want, (keys, len(got), len(want))


@pytest.mark.parametrize("seed", range(6))
def test_random_window_frames_match_duckdb(spark, sf_dir, duck, seed):
    """Random bounded ROWS frames: running sums over each supplier's
    orders with a random preceding/following extent, both engines —
    frame-boundary semantics pinned across the parameter space."""
    rng = random.Random(200 + seed)
    prec = rng.randint(0, 5)
    foll = rng.randint(0, 3)

    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber")
        .rowsBetween(-prec, foll)
    )
    got = {
        (r.l_suppkey, r.l_orderkey, r.l_linenumber): r.s
        for r in li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_quantity").over(w), 2).alias("s"),
        ).collect()
    }
    want = {
        (sk, ok, ln): s
        for sk, ok, ln, s in duck.execute(
            f"""SELECT l_suppkey, l_orderkey, l_linenumber,
                       round(sum(l_quantity) OVER (
                           PARTITION BY l_suppkey
                           ORDER BY l_orderkey, l_linenumber
                           ROWS BETWEEN {prec} PRECEDING AND {foll} FOLLOWING), 2)
                FROM lineitem"""
        ).fetchall()
    }
    assert got == want, (prec, foll, len(got), len(want))


@pytest.mark.parametrize("seed", range(6))
def test_random_outer_join_types_match_duckdb(spark, sf_dir, duck, seed):
    """Random join type x random one-side filter: row count and
    null-extension counts must match DuckDB — the outer-join
    null-semantics check across the parameter space."""
    rng = random.Random(300 + seed)
    join_type, sql_type = rng.choice(
        [("left_outer", "LEFT OUTER"), ("right_outer", "RIGHT OUTER"),
         ("full_outer", "FULL OUTER"), ("inner", "INNER")]
    )
    bal = rng.randint(-500, 5000)
    pr = rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])

    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > bal)
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != pr
    )
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, join_type)
    got = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("null_right"),
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("null_left"),
    ).collect()[0]

    want = duck.execute(
        f"""SELECT count(*),
                   count(*) FILTER (o_orderkey IS NULL),
                   count(*) FILTER (c_custkey IS NULL)
            FROM (SELECT * FROM customer WHERE c_acctbal > {bal}) c
            {sql_type} JOIN
                 (SELECT * FROM orders WHERE o_orderpriority <> '{pr}') o
              ON c.c_custkey = o.o_custkey"""
    ).fetchone()
    assert (got.n, got.null_right, got.null_left) == want, (join_type, bal, pr)


@pytest.mark.parametrize("grain", ["year", "quarter", "month", "week", "day", "hour"])
def test_date_trunc_grains_match_duckdb(spark, sf_dir, grain):
    """Every date_trunc grain bucket-counts identically on both
    engines over the events timeline — week start and quarter
    boundaries are classic cross-engine divergence points."""
    ev = load_table(spark, sf_dir, "events")  # loader normalizes ts
    got = {
        str(r.b): r.n
        for r in ev.groupBy(F.date_trunc(grain, "ts").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    con = duckdb.connect()
    typ = con.execute(
        f"DESCRIBE SELECT ts FROM '{sf_dir}/events.parquet'"
    ).fetchone()[1]
    ts_expr = (
        "make_timestamp(ts // 1000)" if typ == "BIGINT" else "ts"
    )
    want = {
        str(b): n
        for b, n in con.execute(
            f"""SELECT CAST(date_trunc('{grain}', {ts_expr}) AS TIMESTAMP) AS b,
                       count(*)
                FROM '{sf_dir}/events.parquet' GROUP BY 1"""
        ).fetchall()
    }
    assert got == want, (grain, len(got), len(want))
