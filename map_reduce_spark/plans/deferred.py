"""Deferred-execution DataFrame proxy for builders whose PLAN cannot
be expressed lazily.

Three registered-query families must run real Spark jobs before they
have a batch result to return (the sanctioned QuerySpec exceptions up
to r5): streaming replays (a drained Trigger.AvailableNow query has no
lazily-returnable batch plan), trained-index ANN (IVF centroids / PQ
codebooks are bounded collects folded into the plan as literals), and
iterative connected-components fixpoints (each lineage-checkpointed
round is a job). Until r6 those builders were EAGER — anything that
built all registered queries (plan audits, schema walks, the driver's
builder sweep) silently paid ~10 s of replays and training.

``DeferredDataFrame`` restores the build-is-cheap invariant: the
builder returns instantly with a declared result schema; the bounded
jobs fire exactly once, on the first access that needs the real plan
(an action, ``explain``, column expressions, ...). Schema-level
introspection — ``schema`` / ``columns`` / ``dtypes`` / ``schema``-
printing / ``sparkSession`` — is served from the declared schema
WITHOUT materializing, which is precisely what audits and schema
walks need. The declared schema is pinned equal to the materialized
schema by tests/test_deferred.py for every deferred entry.

Implementation: a ``classic.DataFrame`` subclass (so
``isinstance``-based dispatch in pyspark.sql.dataframe's
``dispatch_df_method`` routes to the classic implementations) that
never calls the parent ``__init__``; ``__getattribute__`` serves the
cheap introspection surface pre-materialization and otherwise
materializes the thunk once and delegates everything — including
``_jdf``, so inherited methods invoked un-dispatched also work.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.classic.dataframe import DataFrame as _ClassicDataFrame

# Attribute names served WITHOUT materializing while the thunk has not
# run. Everything else materializes.
_CHEAP = frozenset({"schema", "columns", "dtypes", "sparkSession", "printSchema"})
# Internal slots of the proxy itself.
_SELF = frozenset(
    {"_d_spark", "_d_schema", "_d_thunk", "_d_df", "_d_materialize", "is_materialized"}
)


class DeferredDataFrame(_ClassicDataFrame):
    """A DataFrame whose underlying plan is built on first use.

    ``thunk`` must return a fully-built DataFrame whose schema equals
    ``schema`` (DDL string or StructType). The thunk runs at most once.
    """

    def __new__(cls, spark=None, schema=None, thunk=None):
        # the parent classes define __new__ with a (jdf, session)
        # signature; bypass them — the proxy holds no JVM handle until
        # materialization
        return object.__new__(cls)

    def __init__(
        self,
        spark: SparkSession,
        schema: str | T.StructType,
        thunk: Callable[[], DataFrame],
    ):
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        object.__setattr__(self, "_d_spark", spark)
        object.__setattr__(self, "_d_schema", schema)
        object.__setattr__(self, "_d_thunk", thunk)
        object.__setattr__(self, "_d_df", None)

    # -- proxy plumbing ---------------------------------------------------
    def _d_materialize(self) -> DataFrame:
        get = object.__getattribute__
        if get(self, "_d_df") is None:
            df = get(self, "_d_thunk")()
            object.__setattr__(self, "_d_df", df)
        return get(self, "_d_df")

    @property
    def is_materialized(self) -> bool:
        return object.__getattribute__(self, "_d_df") is not None

    def __getattribute__(self, name):
        get = object.__getattribute__
        if name in _SELF or name.startswith("__"):
            return get(self, name)
        if get(self, "_d_df") is None and name in _CHEAP:
            schema = get(self, "_d_schema")
            if name == "schema":
                return schema
            if name == "columns":
                return [f.name for f in schema.fields]
            if name == "dtypes":
                return [(f.name, f.dataType.simpleString()) for f in schema.fields]
            if name == "sparkSession":
                return get(self, "_d_spark")
            if name == "printSchema":
                return lambda level=None: print(schema.treeString())
        return getattr(get(self, "_d_materialize")(), name)

    def __repr__(self) -> str:  # avoid materializing in debuggers/logs
        get = object.__getattribute__
        state = "materialized" if get(self, "_d_df") is not None else "deferred"
        cols = ", ".join(f.name for f in get(self, "_d_schema").fields)
        return f"DeferredDataFrame[{state}]({cols})"


def deferred(
    spark: SparkSession, schema: str | T.StructType, thunk: Callable[[], DataFrame]
) -> DataFrame:
    """Builder-facing constructor (reads better at call sites)."""
    return DeferredDataFrame(spark, schema, thunk)
