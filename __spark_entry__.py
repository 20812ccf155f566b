"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``map_reduce_spark/``; this file is a thin
adapter over the central query registry
(``map_reduce_spark.registry``), so every registered operator is
automatically exposed to the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_spark.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1 — the canonical scan→filter→hash-agg pipeline.
    """
    specs = load_all()
    return specs["q1_pricing_summary"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query.

    Queries whose semantics are not SQL-expressible (Spark-internal
    hash functions, approximate/streaming ops) are omitted here and
    covered by pytest ground-truth checks instead.
    """
    return {
        name: spec.oracle_sql
        for name, spec in load_all().items()
        if spec.oracle_sql is not None
    }
