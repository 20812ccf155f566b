"""Bucketed-table layout: pre-shuffled storage for co-located joins.

At the 100 TB design point the dominant recurring cost of a
fact-to-fact join (orders ⋈ customer, lineitem ⋈ orders) is the
shuffle of both sides on the join key — paid on EVERY query. Bucketed
tables pay that shuffle ONCE at write time: ``bucketBy(n, key)``
hash-partitions rows into a fixed number of per-key-range files, and
any later equi-join (or groupBy) on the bucket key reads both sides
already co-partitioned — the physical plan contains ZERO Exchange
operators (pinned by tests/test_bucketed.py).

This is the Spark analogue of the reference engine's fixed
``nReduce`` intermediate layout (/root/reference/src/mr/worker.go:
mr-X-Y files hash-partitioned by FNV-32a — a bucketed write that the
reduce phase consumes co-located): the bucket count plays the role of
nReduce, chosen once per table family so joins between them align.

Usage shape (ETL writes once, every downstream query benefits):

    write_bucketed(orders,   "orders_b",   "o_custkey", 32)
    write_bucketed(customer, "customer_b", "c_custkey", 32)
    joined = bucketed_tables_join(spark, "orders_b", "customer_b",
                                  "o_custkey", "c_custkey")

Bucket-count discipline: both sides must use the SAME count (Spark
joins aligned bucket sets without a shuffle; mismatched counts fall
back to shuffling the smaller-bucketed side). At 100 TB size the
count so each bucket file stays in the 128 MB–1 GB parquet sweet
spot — e.g. 30 TB of orders at 512 MB/bucket-file per partition
needs ~2048 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int, sort: bool = True
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    managed parquet table.

    ``sortBy(key)`` additionally orders rows inside each bucket file,
    which lets a downstream sort-merge join skip the per-task sort as
    well (the read is already key-ordered) and makes min/max row-group
    pruning on the key exact.
    """
    writer = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_tables_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two equally-bucketed tables on their bucket keys.

    With ``spark.sql.sources.bucketing.enabled`` (default true) and
    matching bucket counts, Catalyst plans a sort-merge join whose
    children are bare scans — no Exchange on either side.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
