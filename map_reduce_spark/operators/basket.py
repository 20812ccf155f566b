"""Market-basket analysis: pairwise association rules over orders.

The retail-analytics classic (Agrawal/Srikant's frequent-itemset
setting, restricted to pairs): for parts A, B that co-occur in
orders, report support(A,B), confidence(A=>B) and lift — the
composable statistics every recommender / cross-sell dashboard
starts from.

Scale design (100 TB):
- Pair generation is the per-basket self-join on the order key: the
  expansion is bounded by basket size squared (TPC-H baskets are ~7
  lines), i.e. a CONSTANT factor on the fact table, never corpus^2.
  Distinct-ifying (order, part) first keeps multi-line duplicates of
  the same part from inflating counts.
- Everything downstream of the pair counts is vocabulary-bounded
  (parts x parts at worst, support-filtered far below that) and the
  single-item counts broadcast back for confidence/lift.
- A support floor (MIN_PAIR_ORDERS) is applied AT THE AGGREGATE —
  the standard a-priori pruning point; raising it is what bounds the
  rule table at real scale.

All counts are exact integers; ratios round(6) on bounded-int
rationals, the established convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_table

MIN_PAIR_ORDERS = 3  # a-priori support floor

_BASKET_ORACLE = f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n_orders AS (SELECT count(DISTINCT o) AS n FROM op),
    item AS (SELECT p, count(*) AS n_p FROM op GROUP BY p),
    pairs AS (
        SELECT a.p AS pa, b.p AS pb, count(*) AS n_ab
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p
        HAVING count(*) >= {MIN_PAIR_ORDERS}
    )
    SELECT pa, pb,
           CAST(n_ab AS BIGINT) AS n_both,
           round(n_ab * 1.0 / n, 6) AS support,
           round(n_ab * 1.0 / ia.n_p, 6) AS confidence_a_to_b,
           round(n_ab * 1.0 * n / (ia.n_p * ib.n_p), 6) AS lift
    FROM pairs
    JOIN item ia ON ia.p = pa
    JOIN item ib ON ib.p = pb
    CROSS JOIN n_orders
    ORDER BY pa, pb
"""


@register("basket_part_association", oracle_sql=_BASKET_ORACLE)
def basket_part_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise association rules over order baskets: for co-ordered
    part pairs above the support floor, exact co-occurrence count,
    support, confidence(A=>B), and lift. See module docstring for
    the bounded-expansion scale argument.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    op = lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n_orders = op.select("o").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    item = op.groupBy("p").agg(F.count(F.lit(1)).alias("n_p"))
    a = op.select(F.col("o"), F.col("p").alias("pa"))
    b = op.select(F.col("o").alias("o2"), F.col("p").alias("pb"))
    pairs = (
        a.join(b, (F.col("o") == F.col("o2")) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_PAIR_ORDERS)
    )
    ia = item.select(F.col("p").alias("ia_p"), F.col("n_p").alias("n_a"))
    ib = item.select(F.col("p").alias("ib_p"), F.col("n_p").alias("n_b"))
    return (
        pairs.join(ia, F.col("pa") == F.col("ia_p"))
        .join(ib, F.col("pb") == F.col("ib_p"))
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            F.col("n_ab").alias("n_both"),
            F.round(F.col("n_ab") * 1.0 / F.col("n"), 6).alias("support"),
            F.round(F.col("n_ab") * 1.0 / F.col("n_a"), 6).alias(
                "confidence_a_to_b"
            ),
            F.round(
                F.col("n_ab") * 1.0 * F.col("n")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy("pa", "pb")
    )
