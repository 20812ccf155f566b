"""Property tests for the data-quality operators (operators/quality.py).

Value-level correctness is covered by the DuckDB oracle gate
(dq_validate_constraints + stats_table_profile are oracle-gated);
these pin the semantics the oracle hash alone doesn't name: null
handling in violation counters, agreement with independently-computed
counts, and the single-fused-aggregate plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_spark.operators.quality import _viol
from map_reduce_spark.plans.explain import physical_plan
from map_reduce_spark.registry import load_all
from map_reduce_spark.sources import load_table


def _report(spark, sf_dir):
    df = load_all()["dq_validate_constraints"].builder(spark, sf_dir)
    return {
        (r["tbl"], r["check_name"]): (r["checked_rows"], r["violations"])
        for r in df.collect()
    }


def test_dq_counts_match_independent_computation(spark, sf_dir):
    """Each counter agrees with a from-scratch computation that takes
    a different plan shape (groupBy-having instead of fused agg)."""
    rep = _report(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    n_orders, n_lineitem = orders.count(), lineitem.count()
    assert rep[("orders", "pk_unique_orderkey")][0] == n_orders
    assert rep[("lineitem", "quantity_in_range")][0] == n_lineitem

    # PK duplicates via groupBy-having (vs count - count_distinct).
    dup_li = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.sum(F.col("n") - 1).alias("extra"))
        .collect()[0]["extra"]
        or 0
    )
    assert rep[("lineitem", "pk_unique_orderkey_linenumber")][1] == dup_li

    # Referential orphans via distinct-key subtraction.
    ok = {r["o_orderkey"] for r in orders.select("o_orderkey").collect()}
    lk = {r["l_orderkey"] for r in lineitem.select("l_orderkey").distinct().collect()}
    orphan_keys = lk - ok
    orphan_rows = (
        lineitem.filter(F.col("l_orderkey").isin(list(orphan_keys))).count()
        if orphan_keys
        else 0
    )
    assert rep[("lineitem", "fk_orderkey_orphans")][1] == orphan_rows

    # Range checks recomputed with the complement predicate.
    bad_qty = lineitem.filter(
        ~F.col("l_quantity").between(1.0, 50.0)
        | F.col("l_quantity").isNull()
    ).count()
    assert rep[("lineitem", "quantity_in_range")][1] == bad_qty


def test_viol_counts_null_as_violation(spark):
    """Unknown data is bad data: a NULL validity predicate counts."""
    df = spark.createDataFrame(
        [(1.0,), (None,), (-2.0,)], "x double"
    )
    n = df.agg(_viol(F.col("x") > 0).alias("v")).collect()[0]["v"]
    assert n == 2  # NULL and -2.0; 1.0 passes


def test_dq_single_fused_scan_per_check_family(spark, sf_dir):
    """The per-table check families run as ONE aggregate each: the
    plan holds exactly the expected number of parquet scans (orders:
    fused agg + anti-join probe + custkey-orphan side = 3; lineitem:
    fused agg + anti-join side = 2; customer: 1), not one per check."""
    df = load_all()["dq_validate_constraints"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("orders.parquet") == 3
    assert plan.count("lineitem.parquet") == 2
    assert plan.count("customer.parquet") == 1


def test_profile_matches_independent_stats(spark, sf_dir, duck):
    """Spot-check the profile against independent DuckDB aggregates
    computed with different expressions (approx-free, typed)."""
    df = load_all()["stats_table_profile"].builder(spark, sf_dir)
    rows = {(r["tbl"], r["col"]): r for r in df.collect()}

    ndv_seg, min_bal, max_bal, n_null = duck.execute(
        """
        SELECT count(DISTINCT c_mktsegment),
               min(c_acctbal), max(c_acctbal),
               sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)
        FROM customer
        """
    ).fetchone()
    seg = rows[("customer", "c_mktsegment")]
    bal = rows[("customer", "c_acctbal")]
    assert seg["ndv"] == ndv_seg
    assert seg["n_null"] == (n_null or 0)
    assert seg["min_num"] is None and seg["avg_len"] is not None
    assert bal["min_num"] == min_bal and bal["max_num"] == max_bal
    assert bal["min_str"] is None and bal["avg_len"] is None

    ts = rows[("orders", "o_orderdate")]
    lo, hi = duck.execute(
        "SELECT strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),"
        "       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM orders"
    ).fetchone()
    assert ts["min_str"] == lo and ts["max_str"] == hi


def test_profile_one_scan_per_table(spark, sf_dir):
    """Per-column stats fuse into one aggregate scan per table."""
    df = load_all()["stats_table_profile"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("orders.parquet") == 1
    assert plan.count("customer.parquet") == 1
