"""Laziness pins for the deferred-builder family (r5 verdict item 4).

Until r6 the streaming/ANN/connected-components builders ran real
Spark jobs at BUILD time (sanctioned but costly: any tool building all
registered queries paid ~10 s of replays and training). They now
return ``plans.deferred.DeferredDataFrame`` proxies. These tests pin:

- building every deferred entry runs ZERO Spark jobs (job-group probe,
  same technique as tests/test_percentiles.py::test_builder_is_lazy);
- schema / columns / dtypes are served pre-materialization and match
  the MATERIALIZED result exactly (names + types), so audits see the
  truth;
- the first action materializes once, the thunk never re-runs, and
  the result flows through ordinary DataFrame methods (isinstance,
  filter, count) — i.e. the proxy is a drop-in DataFrame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame

from map_reduce_spark.plans.deferred import DeferredDataFrame, deferred
from map_reduce_spark.registry import load_all

DEFERRED_ENTRIES = [
    "streaming_tumbling_type_counts",
    "streaming_error_click_join",
    "streaming_stateful_user_totals",
    "streaming_session_windows",
    "streaming_dedup_exactly_once",
    "sim_knn_ivf",
    "sim_knn_pq",
    "sim_knn_ivfpq",
    "dedup_duplicate_clusters",
    "dedup_cluster_keep_best",
    "dedup_semantic_clusters",
]


def test_all_deferred_builders_run_zero_jobs_at_build(spark, sf_dir):
    """Building the entire deferred family must schedule no Spark jobs
    at all — not even schema inference (the declared schema is a
    literal)."""
    specs = load_all()
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("deferred_build_probe", "deferred laziness probe")
    try:
        built = {n: specs[n].builder(spark, sf_dir) for n in DEFERRED_ENTRIES}
        for df in built.values():
            _ = df.columns  # introspection must stay free
            _ = df.schema
            _ = df.dtypes
    finally:
        sc.setJobGroup("", "")
    jobs = tracker.getJobIdsForGroup("deferred_build_probe") or []
    assert not jobs, f"deferred builders ran {len(jobs)} jobs at build: {jobs}"
    for name, df in built.items():
        assert isinstance(df, DeferredDataFrame), name
        assert isinstance(df, DataFrame), name
        assert not df.is_materialized, name


@pytest.mark.parametrize(
    "name",
    # one cheap representative per family keeps the suite fast; the
    # oracle gate materializes every entry anyway
    ["streaming_tumbling_type_counts", "sim_knn_ivf", "dedup_duplicate_clusters"],
)
def test_declared_schema_matches_materialized(spark, sf_dir, name):
    specs = load_all()
    df = specs[name].builder(spark, sf_dir)
    declared = list(df.dtypes)
    declared_cols = list(df.columns)
    n = df.count()  # first action: materializes
    assert n >= 0
    assert df.is_materialized
    assert list(df.dtypes) == declared, name
    assert list(df.columns) == declared_cols, name


def test_thunk_runs_once_and_delegates():
    calls = []

    class FakeSpark:  # deferred() only stores it until materialization
        pass

    def thunk():
        calls.append(1)
        raise RuntimeError("boom")  # prove access reaches the thunk

    # a StructType (not DDL) keeps construction session-free
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("a", T.LongType())])
    proxy = DeferredDataFrame(FakeSpark(), schema, thunk)
    assert proxy.columns == ["a"]
    assert proxy.dtypes == [("a", "bigint")]
    assert not calls  # introspection never calls the thunk
    with pytest.raises(RuntimeError, match="boom"):
        _ = proxy.count()
    assert calls == [1]


def test_materialized_delegation_roundtrip(spark):
    """A deferred proxy over a plain local DataFrame behaves like that
    DataFrame for transformations and actions, and materializes
    exactly once."""
    calls = []

    def thunk():
        calls.append(1)
        return spark.range(10).withColumnRenamed("id", "a")

    from pyspark.sql import types as T

    proxy = DeferredDataFrame(
        spark, T.StructType([T.StructField("a", T.LongType())]), thunk
    )
    assert proxy.sparkSession is spark
    assert [f.name for f in proxy.schema.fields] == ["a"]
    assert not calls
    assert proxy.filter("a >= 5").count() == 5
    assert proxy.count() == 10
    assert calls == [1]
    # post-materialization, schema comes from the real frame
    assert proxy.schema.fieldNames() == ["a"]
