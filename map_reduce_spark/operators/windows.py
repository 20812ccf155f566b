"""Window-function operators (ranking, running totals, lag/lead,
sessionization) over orders and events.

The reference engine has no window functions (SURVEY.md §2.3 row
"Window functions: absent"); these are native-surface operators.

Scale notes: every window here partitions by a high-cardinality key
(customer / user), so state per partition stays small and Spark's
window exec streams each partition sorted — one shuffle per distinct
(partitionBy, orderBy) clause. Builders reuse a single window spec
across multiple columns to avoid repeated shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_table


@register(
    "window_topn_orders_per_customer",
    oracle_sql="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
    FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    ORDER BY c_custkey, rn
    """,
)
def window_topn_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via row_number window (the scalable top-k-per-key).

    Scale: one shuffle on o_custkey; AQE handles skewed customers.
    Deterministic tiebreak (o_orderkey) keeps the oracle hash stable.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rn",
        )
        .orderBy("c_custkey", "rn")
    )


@register(
    "window_running_customer_spend",
    oracle_sql="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg_3
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average per customer (frame windows)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
            ).alias("running_spend"),
            # round(.,4): a 3-row avg of 2-decimal prices never lands on an
            # exact half at the 4th decimal, so the cross-engine hash is stable
            F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, W.currentRow)), 4).alias(
                "moving_avg_3"
            ),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_lag_order_gap_days",
    oracle_sql="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS days_since_prev
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() inter-order gap in days per customer (NULL for first order)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date")).alias(
                "days_since_prev"
            ),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_rank_dense_ntile",
    oracle_sql="""
    SELECT l_suppkey,
           round(supp_rev, 2) AS supp_rev,
           rank()       OVER (ORDER BY supp_rev DESC, l_suppkey) AS rev_rank,
           dense_rank() OVER (ORDER BY supp_rev DESC, l_suppkey) AS rev_dense_rank,
           ntile(4)     OVER (ORDER BY supp_rev DESC, l_suppkey) AS rev_quartile
    FROM (
        SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS supp_rev
        FROM lineitem GROUP BY l_suppkey)
    ORDER BY rev_rank
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over per-supplier revenue.

    Scale: the global (unpartitioned) window runs on the *aggregated*
    supplier table (|suppliers| rows), never on raw lineitem.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp_rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("supp_rev")
    )
    w = W.orderBy(F.desc("supp_rev"), F.asc("l_suppkey"))
    return (
        supp_rev.select(
            "l_suppkey",
            F.round("supp_rev", 2).alias("supp_rev"),
            F.rank().over(w).alias("rev_rank"),
            F.dense_rank().over(w).alias("rev_dense_rank"),
            F.ntile(4).over(w).alias("rev_quartile"),
        )
        .orderBy("rev_rank")
    )


@register(
    "sessionize_user_events",
    oracle_sql="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM marked
    )
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           count(*) AS n_events,
           round(count(*) * 1.0 / count(DISTINCT session_id), 4) AS events_per_session
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def sessionize_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-min-gap sessions via lag + running sum.

    The classic scalable sessionizer: one shuffle on user_id, two
    window passes over the same sorted partition (Spark reuses the
    sort), then a decomposable aggregate. Streaming twin lives in
    streaming/ (session_window).
    """
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    marked = events.withColumn(
        "new_session",
        F.when(gap_sec.isNull() | (gap_sec > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.count(F.lit(1)) * F.lit(1.0) / F.countDistinct("session_id"), 4
            ).alias("events_per_session"),
        )
        .orderBy("user_id")
    )
