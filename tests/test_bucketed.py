"""Bucketed-layout tests: the write-once-shuffle-once contract.

Pins the property that makes bucketing worth it at 100 TB: an
equi-join of two tables bucketed on their join keys plans with ZERO
Exchange operators (no shuffle on either side), and still produces
exactly the same rows as the plain shuffled join.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from map_reduce_spark.plans.explain import physical_plan
from map_reduce_spark.sources import load_table
from map_reduce_spark.sources.bucketed import bucketed_tables_join, write_bucketed

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    write_bucketed(orders, "t_orders_b", "o_custkey", N_BUCKETS)
    write_bucketed(customer, "t_customer_b", "c_custkey", N_BUCKETS)
    yield "t_orders_b", "t_customer_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_bucketed_join_plans_zero_exchanges(spark, bucketed_tables):
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join to stay sort-merge so the assertion exercises
        # the co-located path (a broadcast join would trivially have no
        # exchange and prove nothing)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = bucketed_tables_join(spark, left, right, "o_custkey", "c_custkey")
        plan = physical_plan(df)
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = (
        bucketed_tables_join(spark, left, right, "o_custkey", "c_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .toPandas()
        .sort_values("c_mktsegment", ignore_index=True)
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    want = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .toPandas()
        .sort_values("c_mktsegment", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_bucketed_groupby_needs_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the stored
    partitioning — the other recurring shuffle bucketing amortizes."""
    left, _ = bucketed_tables
    df = spark.table(left).groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    assert "Exchange" not in physical_plan(df)
