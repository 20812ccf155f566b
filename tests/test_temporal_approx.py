"""Tests for the temporal joins and approximate aggregates."""

from __future__ import annotations

import pandas as pd

from map_reduce_spark.operators.temporal import (
    agg_approx_distinct,
    asof_error_after_signup,
)
from map_reduce_spark.sources import load_table
from pyspark.sql import functions as F


def test_approx_distinct_error_bound(spark, sf_dir):
    """HLL++ at rsd=0.02 must stay within 5% of the exact count."""
    approx = {
        r.o_orderpriority: r.approx_customers
        for r in agg_approx_distinct(spark, sf_dir).collect()
    }
    exact = {
        r.o_orderpriority: r.exact
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / max(exact[k], 1)
        assert rel_err <= 0.05, f"{k}: approx={approx[k]} exact={exact[k]}"


def test_asof_matches_pandas_merge_asof(spark, sf_dir):
    """Cross-check the window-based as-of join against pandas
    merge_asof (the reference implementation of as-of semantics)."""
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["ts"] = pd.to_datetime(ev["ts"])
    errors = (
        ev[ev.event_type == "error"]
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    signups = (
        ev[ev.event_type == "signup"]
        .sort_values(["ts", "event_id"])[["user_id", "ts"]]
        .rename(columns={"ts": "signup_ts"})
        .reset_index(drop=True)
    )
    expected = pd.merge_asof(
        errors, signups, left_on="ts", right_on="signup_ts", by="user_id"
    )
    expected_map = {
        int(r.event_id): (None if pd.isna(r.signup_ts) else str(r.signup_ts.floor("s")))
        for r in expected.itertuples()
    }
    got = {
        r.event_id: r.last_signup_ts
        for r in asof_error_after_signup(spark, sf_dir).collect()
    }
    assert got == expected_map
