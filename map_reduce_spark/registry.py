"""Central query registry.

Every operator/query the engine claims is registered here as
``name -> QuerySpec(builder, oracle_sql)``. The driver contract
(``__spark_entry__.py``) and the bench harness (``bench.py``) both
enumerate this registry, so adding an operator in any module makes it
visible to the correctness gate and the benchmark automatically.

``oracle_sql`` is ANSI SQL that DuckDB can run over the same parquet
tables and that must hash-match the Spark result (same column names,
same values). Operators whose semantics are not SQL-expressible
(e.g. MinHash-LSH with Spark-internal hash functions) register
``oracle_sql=None`` and are covered by pytest ground-truth checks
instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryBuilder
    oracle_sql: str | None
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle_sql: str | None = None):
    """Decorator: register a query builder under ``name``."""

    def deco(fn: QueryBuilder) -> QueryBuilder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name, fn, oracle_sql, fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry.

    IMPORT ORDER IS REGISTRATION ORDER, and registration order is the
    order the driver's correctness gate walks the queries. The r1 run
    checked only the first 50 registry entries, leaving the entire
    LLM-pipeline family (registered last) unverified — so the
    north-star operators (dedup / similarity / text / events /
    multimodal) now register FIRST, and the long-stable relational /
    window / SQL demos bring up the rear.
    """
    from map_reduce_spark.functions import text, dedup, similarity, multimodal  # noqa: F401
    from map_reduce_spark.operators import text_rel  # noqa: F401
    from map_reduce_spark.streaming import events_batch  # noqa: F401
    from map_reduce_spark.operators import (  # noqa: F401
        temporal,
        advanced,
        relational2,
        relational,
        windows,
        sql_queries,
    )

    return QUERIES
