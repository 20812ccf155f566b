"""Parquet table loaders for the star-schema / events / LLM fixtures.

Schemas documented in FIXTURES.md §B (verified against
/root/testdata/sf0.001). All reads are plain ``spark.read.parquet`` so
Catalyst gets full predicate-pushdown + column-pruning into the scan.

Scale notes: region (5 rows) and nation (25 rows) are constant-size;
supplier grows slowly and stays broadcast-sized at realistic scale
factors. customer, part, and orders grow LINEARLY with scale factor —
they are fact-sized at the 100 TB design point and must never be
force-broadcast; joins against them shuffle on the key and AQE may
downgrade to broadcast at small SF. ``DIM_TABLES`` marks only the
always-safe broadcast set.
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
# customer/part/orders grow with sf and are deliberately NOT here.
DIM_TABLES = {"region", "nation", "supplier"}


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
        # Exact integer division (DIV): ns magnitudes (~1.7e18) are not
        # representable in an IEEE double, so float division + floor()
        # can land 1 µs low. DIV stays in long arithmetic — lossless.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
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
