"""Parquet table loaders for the star-schema / events / LLM fixtures.

Schemas documented in FIXTURES.md §B (verified against
/root/testdata/sf0.001). All reads are plain ``spark.read.parquet`` so
Catalyst gets full predicate-pushdown + column-pruning into the scan.

Scale notes: the dimension tables (region 5, nation 25, supplier
~10/sf-unit, part, customer) stay broadcast-sized even at 100 TB-of-
lineitem scale factors; ``DIM_TABLES`` marks them so query builders
can apply ``F.broadcast`` hints deliberately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Tables that remain small relative to the fact table at any scale
# factor — always safe to broadcast in a join against lineitem/orders.
DIM_TABLES = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the Spark reader
        # rejects outright. Read it as raw int64 nanos (legacy conf) and
        # rebuild a microsecond TimestampType column; the fixture has no
        # sub-microsecond components so the conversion is lossless.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, *keys: str
) -> DataFrame:
    """Load a table and repartition it across all cores.

    Small single-file parquet arrives as ONE input split, which would
    serialize compute-heavy narrow transforms (tokenize, shingle,
    vector math) onto a single task. One cheap shuffle of the raw
    rows buys full-cluster parallelism for everything downstream —
    the right trade whenever per-row work dominates row width. On a
    real cluster with many input files this is a near-no-op (the
    scan is already split); keyed variants also pre-align the
    partitioning with a downstream join/agg key.
    """
    n = spark.sparkContext.defaultParallelism
    df = load_table(spark, sf_dir, name)
    return df.repartition(n, *keys) if keys else df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
