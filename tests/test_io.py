"""Source/sink round-trips and scan-pruning assertions for
map_reduce_spark.sources.io (SURVEY.md §2.3 scans/sinks rows)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from map_reduce_spark.sources import load_table
from map_reduce_spark.sources.io import read_table, write_table

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


def canon(df) -> pd.DataFrame:
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def test_csv_round_trip_pinned_schema(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    write_table(nation, path, "csv")
    back = read_table(spark, path, "csv", schema=NATION_SCHEMA)
    assert back.schema == NATION_SCHEMA
    pd.testing.assert_frame_equal(canon(nation), canon(back))


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC is the second columnar format: round-trips exactly and
    carries predicate pushdown into the scan like parquet."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    path = str(tmp_path / "orders_orc")
    write_table(orders, path, "orc")
    back = read_table(spark, path, "orc")
    assert back.schema == orders.schema
    pd.testing.assert_frame_equal(canon(orders), canon(back))
    from map_reduce_spark.plans.explain import has_pushed_filters

    assert has_pushed_filters(back.filter(back.o_totalprice > 100000.0))


def test_json_round_trip(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    path = str(tmp_path / "cust_json")
    write_table(cust, path, "json")
    back = read_table(spark, path, "json", schema=cust.schema)
    pd.testing.assert_frame_equal(canon(cust), canon(back))


def test_text_sink_and_source(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    lines = nation.select(
        F.concat_ws(" ", "n_name", "n_nationkey").alias("value")
    )
    path = str(tmp_path / "nation_txt")
    write_table(lines, path, "text")
    back = read_table(spark, path, "text")
    assert sorted(r.value for r in back.collect()) == sorted(
        r.value for r in lines.collect()
    )


def test_partitioned_write_prunes_at_plan_time(spark, sf_dir, tmp_path):
    """Hive-partitioned parquet + an equality predicate on the
    partition column must prune directories in the scan (the partition
    never reaches the executors), and row-group filters must push for
    data columns."""
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    write_table(orders, path, "parquet", partition_by=["o_orderpriority"])

    back = read_table(spark, path, "parquet")
    q = back.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 1000.0)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1-URGENT" in plan
    assert "PushedFilters" in plan and "o_totalprice" in plan

    expected = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 1000.0)
    ).count()
    assert q.count() == expected


def test_parquet_scan_pushdown_on_fixture(spark, sf_dir):
    """The fixture scans themselves must keep pushdown + pruning: a
    2-column projection with a range predicate reads only those columns
    (ReadSchema) and pushes the predicate (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") < 5).select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Operational surface: a dataset whose later files carry an added
    column reads as ONE frame under mergeSchema — old rows surface
    NULL for the new column, new rows carry it, and without the option
    the footer-sampled schema silently hides the evolution."""
    import os

    import pandas as pd

    d = str(tmp_path / "evolving")
    os.makedirs(f"{d}/p=a")
    os.makedirs(f"{d}/p=b")
    pd.DataFrame({"id": [1, 2], "v": [10.0, 20.0]}).to_parquet(f"{d}/p=a/f1.parquet")
    pd.DataFrame(
        {"id": [3], "v": [30.0], "added": ["x"]}
    ).to_parquet(f"{d}/p=b/f2.parquet")

    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"id", "v", "added", "p"}
    rows = {r.id: r.added for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: "x"}


def test_load_table_scan_memo(spark, sf_dir):
    """r12 optimization: load_table memoizes the lazy scan per
    (session, sf_dir, table) — repeat calls return the SAME DataFrame
    (no re-inference driver cost), a different sf_dir gets a different
    frame, and the memoized frame still computes from the parquet
    files (it is a plan memo, not a data/result cache)."""
    a = load_table(spark, sf_dir, "nation")
    b = load_table(spark, sf_dir, "nation")
    assert a is b
    other_dir = (
        "/root/testdata/sf0.01"
        if sf_dir.rstrip("/") != "/root/testdata/sf0.01"
        else "/root/testdata/sf0.001"
    )
    other = load_table(spark, other_dir, "nation")
    assert other is not a
    # still a live lazy scan over parquet, and derived frames are new
    assert a.count() == 25
    derived = a.select("n_name")
    assert derived is not a and derived.columns == ["n_name"]


def test_load_events_raw_schema_matches_stream_contract(spark, sf_dir):
    """The streaming file source takes its schema from the RAW events
    scan (pre-normalization): the raw frame's ts column must be the
    on-disk physical type (long for TIMESTAMP(NANOS) fixtures,
    timestamp otherwise), while load_table serves the normalized
    TimestampType."""
    from pyspark.sql import types as T

    from map_reduce_spark.sources.tables import load_events_raw

    raw = load_events_raw(spark, sf_dir)
    norm = load_table(spark, sf_dir, "events")
    assert isinstance(
        raw.schema["ts"].dataType, (T.LongType, T.TimestampType, T.TimestampNTZType)
    )
    assert isinstance(norm.schema["ts"].dataType, T.TimestampType)
    # memo returns the same raw frame on repeat calls
    assert load_events_raw(spark, sf_dir) is raw
