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

from map_reduce_spark.plans.transient import transient_persist
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


def global_ntile(r, n, k: int):
    """SQL-standard ``ntile(k)`` as a closed-form expression of the
    1-based global position ``r`` and total count ``n``: the first
    ``n % k`` tiles get ``floor(n/k) + 1`` rows. Lets a distributed
    two-level rank derive ntile without any global window; q == 0
    (n < k) only reaches the when-branch, so the /q in the
    otherwise-branch never divides by zero for emitted rows.
    Property-pinned against ``F.ntile`` in tests/test_relational.py.
    """
    q = F.floor(n / k)
    m = n % k
    big = q + 1
    r0 = r - 1
    return F.when(r <= m * big, F.floor(r0 / big) + 1).otherwise(
        m + F.floor((r0 - m * big) / q) + 1
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
    """rank / dense_rank / ntile over per-supplier revenue — computed
    as a DISTRIBUTED two-level rank, never a single-partition window.

    A naive global ``rank() OVER (ORDER BY ...)`` moves every row to
    one partition (Spark logs exactly that warning) — fine for dims,
    fatal for a scale-linear table like TPC-H suppliers (10^9 rows at
    the 100 TB design point). Instead, the same trick as the exact-
    percentile plan, generalized: value-bucket the order key into B
    range buckets off a broadcast (min, max, n); per-bucket counts +
    a cumulative window over the B-row bucket table give each bucket
    its global rank offset; ``row_number`` partitioned BY BUCKET plus
    the offset is the global position. The only unpartitioned windows
    run on the B-row bucket table — bounded by construction. Raise B
    with n to keep per-bucket sorts small; ties on the order key would
    hot-spot a bucket, but the order (supp_rev DESC, l_suppkey ASC) is
    total over doubles, so buckets stay balanced.

    With a total order, rank == dense_rank == global position, and
    ntile(4) is a closed-form function of (position, n) — the SQL-
    standard "first n mod k tiles get one extra row" split — so all
    three come from the one distributed position at zero extra cost.

    The aggregated supplier table feeds both the bucket counts and the
    rank pass; a lazy persist shares that aggregation (it is the table
    being ranked — if it is too big to cache, pay the second agg; the
    plan shape is unchanged).
    """

    B = 64
    K = 4  # quartiles
    li = load_table(spark, sf_dir, "lineitem")
    supp_rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "supp_rev"
            )
        )
    )
    supp_rev = transient_persist(supp_rev)
    stats = supp_rev.agg(
        F.min("supp_rev").alias("_mn"),
        F.max("supp_rev").alias("_mx"),
        F.count(F.lit(1)).alias("_n"),
    )
    sr = supp_rev.crossJoin(F.broadcast(stats))
    width = F.col("_mx") - F.col("_mn")
    # bucket 0 holds the HIGHEST revenues so bucket order equals rank
    # order (supp_rev DESC).
    bucket = F.when(width == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(B - 1),
            F.floor((F.col("_mx") - F.col("supp_rev")) / width * B).cast("int"),
        )
    )
    withb = sr.withColumn("_b", bucket)
    offsets = (
        withb.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn(
            "_base",
            F.coalesce(
                F.sum("_c").over(
                    W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_b", "_base")
    )
    pos = (
        F.row_number().over(
            W.partitionBy("_b").orderBy(F.desc("supp_rev"), F.asc("l_suppkey"))
        )
        + F.col("_base")
    )
    ranked = withb.join(F.broadcast(offsets), "_b").withColumn("_r", pos)
    ntile = global_ntile(F.col("_r"), F.col("_n"), K)
    return (
        ranked.select(
            "l_suppkey",
            F.round("supp_rev", 2).alias("supp_rev"),
            F.col("_r").alias("rev_rank"),
            F.col("_r").alias("rev_dense_rank"),
            ntile.cast("int").alias("rev_quartile"),
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


@register(
    "window_first_last_order_values",
    oracle_sql="""
    SELECT o_custkey,
           CAST(n_orders AS BIGINT) AS n_orders,
           round(first_price, 2) AS first_price,
           round(second_price, 2) AS second_price,
           round(last_price, 2) AS last_price
    FROM (
        SELECT o_custkey,
               count(*) OVER w AS n_orders,
               first_value(o_totalprice) OVER w AS first_price,
               nth_value(o_totalprice, 2) OVER w AS second_price,
               last_value(o_totalprice) OVER w AS last_price,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING))
    WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def window_first_last_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / nth_value / last_value over each customer's order
    history — the remaining window-function API members the window
    family didn't yet exercise (topn/running/lag/rank are elsewhere).

    The frame is pinned explicitly to ROWS UNBOUNDED PRECEDING..
    UNBOUNDED FOLLOWING on BOTH engines: the SQL-default frame for an
    ordered window stops at CURRENT ROW, which silently turns
    last_value into "current value" — the classic portability trap
    this oracle pair locks down. Ties ordered by (date, orderkey) so
    first/second/last pick identical rows everywhere; customers with
    one order get NULL second_price on both engines.

    Scale: one custkey shuffle; the unbounded frame is computed in a
    single pass per partition (no per-row rescan); rn=1 keeps one row
    per customer without a second aggregation.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w_rn = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            F.count(F.lit(1)).over(w).alias("n_orders"),
            F.first("o_totalprice").over(w).alias("first_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
            F.row_number().over(w_rn).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "n_orders",
            F.round("first_price", 2).alias("first_price"),
            F.round("second_price", 2).alias("second_price"),
            F.round("last_price", 2).alias("last_price"),
        )
        .orderBy("o_custkey")
    )
