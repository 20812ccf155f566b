"""Generic source/sink layer: parquet / csv / json / text, with
partitioned writes.

The reference's whole I/O surface is plain text files in and
``"<key> <value>"`` lines out (/root/reference/src/mr/worker.go:78-86,
118-138 — the compat layer reproduces those exactly); this module is
the typed, columnar generalization the analytics surface uses.

Scale notes:
- Parquet is the primary format: columnar, predicate-pushdown- and
  column-pruning-friendly, splittable. ORC is the second columnar
  option (same pushdown/pruning properties, built into Spark) for
  interop with ORC-standardized warehouses. CSV/JSON are interchange
  formats — schema must be pinned explicitly (inference is a full
  extra pass over 100 TB).
- ``partition_by`` produces hive-style directory partitioning so
  equality/range predicates on the partition column prune entire
  directories at plan time (PartitionFilters in the scan node, tested
  in tests/test_io.py).
- Writers never coalesce(1) by default — one output file per task is
  the scalable layout; ``single_file=True`` exists only for
  golden-file tests and small exports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "csv", "json", "text")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    single_file: bool = False,
    **options: str,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    if single_file:
        df = df.coalesce(1)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        options.setdefault("header", "true")
    writer.format(fmt).options(**options).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    reader = spark.read.format(fmt).options(**options)
    if fmt == "csv":
        options.setdefault("header", "true")
        reader = reader.option("header", options["header"])
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        # Interchange formats get one explicit inference pass only when
        # the caller opted out of pinning a schema (small data only).
        reader = reader.option("inferSchema", "true")
    return reader.load(path)
