"""Skyline (Pareto-frontier) operator: non-dominated tuples.

The multi-objective SELECT ... SKYLINE OF shape (Borzsony/Kossmann/
Stocker, ICDE 2001 — the classic OLAP paper): keep the parts no other
part beats on BOTH objectives (cheaper price AND bigger size, strict
somewhere). The naive algorithm is the quadratic dominance self-join
the oracle runs; the operator exploits the 2-D structure to run in
one sort-free distributed pass.

Dominance rewrite (2-D, minimize price / maximize size): a row is
dominated iff
    max{ size : price' <  price } >= size      (strictly cheaper cover)
 OR max{ size : price' == price } >  size      (same price, bigger)
so the skyline needs only two prefix-max aggregates over the price
order — no pairwise join at all.

Scale design (100 TB): a global price-ordered window would serialize
into one partition, so the prefix max splits two-level, using the
skyline's distributivity:
- rows hash into FIXED price-range buckets (price-cents div 1000);
  the within-bucket strict-prefix max is a windowed RANGE frame on
  integer cents (exact "strictly smaller", no float-epsilon trap),
  partitioned by bucket — fully parallel;
- bucket-level maxima form a #buckets-row frame whose running max
  (the cross-bucket prefix) is a window over a bounded table,
  broadcast back by an equi-join on bucket id.
The same decomposition is how distributed skylines are computed in
general: skyline(S) = skyline(union of per-partition skylines); the
bucket prefix-max is that identity specialized to 2 dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_table

_BUCKET_CENTS = 1000  # $10 price-range buckets

_SKYLINE_ORACLE = """
    SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    ORDER BY p.p_retailprice, p.p_partkey
"""


def skyline_min_max(
    df: DataFrame, min_cents_col: str, max_col: str
) -> DataFrame:
    """Rows not dominated under (minimize ``min_cents_col`` — an exact
    integer grid — maximize ``max_col``), via the two-level prefix-max
    decomposition. Keeps all input columns. Works on any frame; the
    registered part query and the randomized quadratic-reference fuzz
    (tests/test_skyline.py) both run through here."""
    c = F.col(min_cents_col)
    df = df.withColumn("_bucket", (c / _BUCKET_CENTS).cast("long"))

    # Within-bucket strict-prefix max: RANGE frame on the integer
    # grid ending 1 below the current value = strictly cheaper rows.
    w_in = (
        W.partitionBy("_bucket")
        .orderBy(min_cents_col)
        .rangeBetween(W.unboundedPreceding, -1)
    )
    # Same-price max (dominance needs strict size there).
    w_eq = W.partitionBy(min_cents_col)
    scored = df.withColumn(
        "_m_lt_local", F.max(max_col).over(w_in)
    ).withColumn("_m_eq", F.max(max_col).over(w_eq))

    # Cross-bucket prefix: per-bucket maxima (bounded: one row per
    # fixed price-range bucket), running max over the buckets below.
    bucket_max = df.groupBy("_bucket").agg(F.max(max_col).alias("_bmax"))
    w_buckets = W.orderBy("_bucket").rowsBetween(W.unboundedPreceding, -1)
    below = bucket_max.select(
        "_bucket", F.max("_bmax").over(w_buckets).alias("_m_below")
    )

    return (
        scored.join(F.broadcast(below), "_bucket")
        .withColumn(
            "_m_lt",
            F.greatest(
                F.coalesce("_m_lt_local", F.lit(-2147483648)),
                F.coalesce("_m_below", F.lit(-2147483648)),
            ),
        )
        .filter(
            (F.col("_m_lt") < F.col(max_col))
            & (F.col("_m_eq") <= F.col(max_col))
        )
        .drop("_bucket", "_m_lt_local", "_m_eq", "_m_below", "_m_lt")
    )


@register("part_skyline_pareto", oracle_sql=_SKYLINE_ORACLE)
def part_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts under (minimize p_retailprice,
    maximize p_size). The oracle is the quadratic NOT EXISTS
    dominance self-join; the Spark plan is the linear two-level
    prefix-max decomposition (module docstring) — a hash match
    certifies the rewrite.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )
    # Exact integer price grid: cents. round() kills any double-ulp
    # noise before the comparison-critical window frames.
    part = part.withColumn(
        "cents", F.round(F.col("p_retailprice") * 100).cast("long")
    )
    return (
        skyline_min_max(part, "cents", "p_size")
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )
