"""Property tests for the monitoring operators
(operators/monitoring.py): the CUSUM closed form against the direct
recursion, ABC class conservation, and rolling-actives window bounds.
"""

from __future__ import annotations

import random
from decimal import Decimal

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from map_reduce_spark.registry import load_all
from map_reduce_spark.sources import load_table


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cusum_closed_form_matches_recursion(spark, seed):
    """S_t = P_t - min(0, P_0..P_t) must equal the textbook
    S_t = max(0, S_{t-1} + (x_t - k)) on random integer series."""
    rng = random.Random(seed)
    k = Decimal("3.500000")
    xs = [rng.randrange(0, 10) for _ in range(50)]
    # reference recursion in exact decimals
    s, ref = Decimal(0), []
    for x in xs:
        s = max(Decimal(0), s + (Decimal(x) - k))
        ref.append(s)
    # engine-side closed form (same expressions as events_cusum_drift)
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t int, n int"
    )
    w = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    dec = "decimal(18,6)"
    out = (
        df.withColumn(
            "p", F.sum(F.col("n").cast(dec) - F.lit(k).cast(dec)).over(w)
        )
        .withColumn(
            "s",
            F.col("p") - F.least(F.min("p").over(w), F.lit(0).cast(dec)),
        )
        .orderBy("t")
        .collect()
    )
    got = [r["s"] for r in out]
    assert got == ref


def test_abc_classes_partition_customers(spark, sf_dir):
    """A/B/C is a partition: counts sum to the customer base with
    orders, shares sum to 1, and A's revenue share >= C's."""
    rows = load_all()["orders_abc_classes"].builder(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-4
    by = {r["abc"]: r for r in rows}
    if "A" in by and "C" in by:
        # A-class customers sit in higher revenue buckets BY
        # CONSTRUCTION, so their per-customer average must dominate
        # (the fixture's near-uniform revenue means A's raw headcount
        # is NOT necessarily smaller — only the average is ordered).
        avg_a = by["A"]["revenue_cents"] / by["A"]["n_customers"]
        avg_c = by["C"]["revenue_cents"] / by["C"]["n_customers"]
        assert avg_a > avg_c


def test_rolling_actives_bounds(spark, sf_dir):
    """Each day's trailing-7d actives is >= that day's 1-day actives
    and <= the global user count; day range equals the observed span."""
    out = load_all()["events_rolling_7d_actives"].builder(spark, sf_dir)
    rows = {r["day"]: r["active_users_7d"] for r in out.collect()}
    events = load_table(spark, sf_dir, "events")
    daily = {
        r["day"]: r["n"]
        for r in events.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    n_users = events.select("user_id").distinct().count()
    assert set(daily) <= set(rows)
    for day, n1 in daily.items():
        assert n1 <= rows[day] <= n_users


def test_ab_test_is_aa_shaped(spark, sf_dir):
    """The hash deal is independent of behavior, so the experiment is
    A/A by construction: headcounts roughly balance and the readout
    must NOT be significant (a significant A/A = broken assignment)."""
    row = load_all()["events_ab_test"].builder(spark, sf_dir).collect()[0]
    total = row["control_users"] + row["treatment_users"]
    events = load_table(spark, sf_dir, "events")
    assert total == events.select("user_id").distinct().count()
    assert not row["significant"]
    assert row["control_conversions"] <= row["control_users"]
    assert row["treatment_conversions"] <= row["treatment_users"]


def test_rolling_actives_interval_sweep_gap_boundaries(spark, tmp_path):
    """Differential test of the r8 interval-sweep rewrite at its
    run-merge boundaries: gaps of exactly 6 days (merge into one
    coverage run), exactly 7 (two runs whose coverages abut — the
    +1/-1 deltas must cancel, not double-count), and 8 (a genuine
    coverage hole). Compared day-for-day against a brute-force
    trailing-window count, including the hi-clip on partial windows.
    """
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 3, 1)
    active = {
        1: [1, 7],       # gap 6: one run, covers days 1..13
        2: [1, 8],       # gap 7: two abutting runs, covers 1..14
        3: [1, 9],       # gap 8: hole on day 8's window? (1..7, 9..15)
        4: [20],         # lone tail day: clipped by hi
    }
    rows_ts, rows_uid = [], []
    for uid, days in active.items():
        for d in days:
            rows_ts.append(base + dt.timedelta(days=d - 1, hours=3))
            rows_uid.append(uid)
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(rows_ts, type=pa.timestamp("us")),
                "user_id": pa.array(rows_uid, type=pa.int64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = {
        r["day"]: r["active_users_7d"]
        for r in load_all()["events_rolling_7d_actives"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    lo, hi = 1, 20  # observed day span
    expect = {}
    for d in range(lo, hi + 1):
        n = sum(
            1
            for days in active.values()
            if any(d - 6 <= a <= d for a in days)
        )
        if n:
            expect[(base + dt.timedelta(days=d - 1)).strftime("%Y-%m-%d")] = n
    assert out == expect
    # The boundary semantics the test exists to pin:
    day = lambda d: (base + dt.timedelta(days=d - 1)).strftime("%Y-%m-%d")
    assert expect[day(13)] >= 2  # gap-6 and gap-7 users still active day 13
    assert day(16) not in expect or expect[day(16)] < 4  # holes are holes
