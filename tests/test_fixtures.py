"""Fixture-schema pin: the dtypes every operator in the repo assumes.

The driver regenerates /root/testdata between rounds, and a silent
physical-type change (r3: events.ts flipped from TIMESTAMP(NANOS) to
TIMESTAMP(MICROS)) broke 8 driver queries with zero failing unit
tests. This file turns any such drift into one obvious failure: it
pins the POST-LOAD logical schema of every table — i.e. the contract
`load_table` provides to the rest of the engine — at all three scale
factors (schema checks are footer-only, so this is cheap).

If this test fails after a fixture regeneration, fix the adapter in
`sources/tables.py` (normalize to these logical types), not the pin —
the rest of the engine is written against exactly these dtypes.
"""

from __future__ import annotations

import os

import pytest

from map_reduce_spark.sources.tables import TABLES, load_table

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    # ts is the one ADAPTED column: whatever the physical fixture type
    # (int64 nanos or TIMESTAMP(MICROS)), load_table must surface a
    # session-TZ TimestampType — windows/watermarks/asof all key on it.
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}

SF_DIRS = [d for d in (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
) if os.path.isdir(d)]


def test_pin_covers_every_table():
    assert sorted(EXPECTED) == sorted(TABLES)


@pytest.mark.parametrize("fixture_dir", SF_DIRS)
@pytest.mark.parametrize("name", TABLES)
def test_fixture_schema_pinned(spark, fixture_dir, name):
    df = load_table(spark, fixture_dir, name)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert got == EXPECTED[name], (
        f"{fixture_dir}/{name}.parquet drifted — adapt sources/tables.py "
        f"to re-normalize (see module docstring)"
    )
