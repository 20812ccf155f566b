"""Maintained-index ANN ingest (functions/sim_ingest.py): the
full-probe ≡ as-of-epoch brute-force differential that stands in for
a SQL oracle (trained centroids are engine-side state), the default-
n_probe recall floor, the index-side-never-shuffles plan pin, and the
deferred-builder contract."""

from __future__ import annotations

import re

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from map_reduce_spark.functions.sim_ingest import (
    _EPOCH_MODS,
    SIM_INGEST_MAX_PROBES_PER_BATCH,
    SIM_INGEST_PROBE_STRIDE,
    SimIngestIndex,
    run_ingest_epochs,
    train_centroids,
)
from map_reduce_spark.functions.similarity import N_CELLS, TOP_K, dot, with_norm
from map_reduce_spark.sources import load_table


def _bruteforce_epoch(spark, sf_dir, k):
    """Exact top-k for epoch k's probes over the index AS OF epoch k
    (bootstrap + earlier batches, minus the retraction epoch's
    deleted slice once it has passed — r12) — same dot-product fold
    order and tiebreaks as SimIngestIndex.probe, so scores are
    bit-identical."""
    from map_reduce_spark.functions.sim_ingest import (
        _DELETE_AFTER_BATCH,
        _DELETE_MOD16,
    )

    emb = with_norm(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "embedding",
        "dv",
        "norm",
    )
    residue = F.col("vec_id") % 8
    live = ~residue.isin(*_EPOCH_MODS[k:])
    if k > _DELETE_AFTER_BATCH:
        live = live & ~(F.col("vec_id") % 16 == _DELETE_MOD16)
    asof = emb.filter(live).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("dv").alias("n_dv"),
        F.col("norm").alias("n_norm"),
    )
    j = (F.col("vec_id") / 8).cast("long")
    is_probe = (j % SIM_INGEST_PROBE_STRIDE == 0) & (
        j / SIM_INGEST_PROBE_STRIDE < SIM_INGEST_MAX_PROBES_PER_BATCH
    )
    probes = emb.filter((residue == _EPOCH_MODS[k]) & is_probe).select(
        F.col("vec_id").alias("probe_id"),
        F.col("dv").alias("p_dv"),
        F.col("norm").alias("p_norm"),
    )
    scored = asof.crossJoin(F.broadcast(probes)).withColumn(
        "score_raw",
        dot(F.col("p_dv"), F.col("n_dv")) / (F.col("p_norm") * F.col("n_norm")),
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("score_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "probe_id", "neighbor_id", F.round("score_raw", 6).alias("score"), "rank"
        )
        .orderBy("probe_id", "rank")
    )


def _epoch_rows(df, k):
    return [
        (r.probe_id, r.neighbor_id, r.score, r.rank)
        for r in df.filter(F.col("batch_seq") == k)
        .orderBy("probe_id", "rank")
        .collect()
    ]


def test_full_probe_equals_asof_epoch_bruteforce(spark, sf_dir):
    """At n_probe = N_CELLS every probe searches every cell, so the
    maintained loop degrades to exact search — each epoch's results
    must EQUAL brute force over the index as of that epoch. Equality
    holds only if the maintained cell table tracked exactly the right
    state at every step (no batch retrieving itself, no lost
    appends) — the differential that puts the loop on a correctness
    gate despite having no SQL oracle."""
    log = run_ingest_epochs(spark, sf_dir, n_probe=N_CELLS)
    for k in range(len(_EPOCH_MODS)):
        want = [
            (r.probe_id, r.neighbor_id, r.score, r.rank)
            for r in _bruteforce_epoch(spark, sf_dir, k).collect()
        ]
        assert want, f"epoch {k} brute force produced no rows"
        assert _epoch_rows(log, k) == want, f"epoch {k} diverged"


def test_default_nprobe_recall_floor(spark, sf_dir):
    """Default n_probe recall@k per epoch against the exact reference
    — same floor as the registered sim_knn_ivf (near-uniform random
    fixture vectors are the IVF worst case, measured ~0.5)."""
    log = run_ingest_epochs(spark, sf_dir)  # default N_PROBE
    recalls = []
    for k in range(len(_EPOCH_MODS)):
        exact: dict[int, set[int]] = {}
        for p, n, _, _ in (
            (r.probe_id, r.neighbor_id, r.score, r.rank)
            for r in _bruteforce_epoch(spark, sf_dir, k).collect()
        ):
            exact.setdefault(p, set()).add(n)
        approx: dict[int, set[int]] = {}
        for p, n, _, _ in _epoch_rows(log, k):
            approx.setdefault(p, set()).add(n)
        assert set(approx) == set(exact)  # every probe emitted
        recalls += [len(approx[p] & exact[p]) / TOP_K for p in exact]
    assert sum(recalls) / len(recalls) >= 0.35, recalls


def test_probe_plan_index_side_never_shuffles(spark, sf_dir):
    """The scale claim: the index (cells-table) side of the search
    contributes ZERO Exchange — probes broadcast into the scan, and
    the only hash exchange in the whole plan is the pair-stream
    window's on probe_id. Re-checked AFTER an append (maintenance
    must not degrade the plan)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = SimIngestIndex(spark, "si_plan_test", n_buckets=4).bootstrap(
        emb.filter(F.col("vec_id") % 2 == 0)
    )
    batch = emb.filter(F.col("vec_id") % 4 == 1)
    probes = batch.filter(F.col("vec_id") % 3 == 1)

    def assert_one_sided():
        plan = idx.probe(probes)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        hash_ex = [
            ln
            for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln
        ]
        bad = [ln for ln in hash_ex if re.search(r"\bcell#\d+", ln)]
        assert not bad, f"index side shuffled on cell: {bad}"
        assert all("probe_id" in ln for ln in hash_ex), hash_ex

    assert_one_sided()
    idx.ingest(batch, probes)
    assert_one_sided()


def test_registered_builder_is_deferred(spark, sf_dir):
    """Build is instant and schema-serving; the loop (bootstrap +
    three eager ingests) fires on first action only (the
    dedup_ingest_epochs contract)."""
    from map_reduce_spark.registry import load_all

    df = load_all()["sim_ingest_epochs"].builder(spark, sf_dir)
    declared = list(df.dtypes)
    assert not df.is_materialized
    assert [c for c, _ in declared] == [
        "batch_seq",
        "probe_id",
        "neighbor_id",
        "score",
        "rank",
    ]
    n = df.count()
    assert n > 0 and df.is_materialized
    assert list(df.dtypes) == declared


def test_delete_and_compact_exclude_retracted_vectors(spark, sf_dir):
    """r12 (r11 verdict item 5): after delete(), a full-probe search
    must EQUAL brute force over the live (insert - delete) corpus —
    no tombstoned neighbor may surface; compact() must change
    nothing observable (physical reclamation only); re-deleting the
    same ids is idempotent."""
    emb = with_norm(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "embedding",
        "dv",
        "norm",
    )
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    idx = SimIngestIndex(spark, "si_delete_test", n_buckets=4).bootstrap(
        corpus.select("vec_id", "embedding")
    )
    dead = corpus.filter(F.col("vec_id") % 8 == 0).select("vec_id")
    n_dead = dead.count()
    assert n_dead > 0
    idx.delete(dead)

    probes_raw = emb.filter(F.col("vec_id") % 2 == 1).limit(7)

    def probe_rows():
        return [
            tuple(r)
            for r in idx.probe(
                probes_raw.select("vec_id", "embedding"), N_CELLS
            ).collect()
        ]

    live = corpus.filter(~(F.col("vec_id") % 8 == 0)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("dv").alias("n_dv"),
        F.col("norm").alias("n_norm"),
    )
    probes = probes_raw.select(
        F.col("vec_id").alias("probe_id"),
        F.col("dv").alias("p_dv"),
        F.col("norm").alias("p_norm"),
    )
    scored = live.crossJoin(F.broadcast(probes)).withColumn(
        "score_raw",
        dot(F.col("p_dv"), F.col("n_dv")) / (F.col("p_norm") * F.col("n_norm")),
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("score_raw"), F.asc("neighbor_id"))
    want = [
        tuple(r)
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= TOP_K) & (F.col("neighbor_id") != F.col("probe_id")))
        .select(
            "probe_id", "neighbor_id", F.round("score_raw", 6).alias("score"), "rank"
        )
        .orderBy("probe_id", "rank")
        .collect()
    ]
    got = probe_rows()
    assert got == want
    dead_ids = {r.vec_id for r in dead.collect()}
    assert not {n for _, n, _, _ in got} & dead_ids

    idx.compact()
    assert probe_rows() == want
    # compaction physically removed the rows (not just re-filtered)
    assert (
        spark.table(idx.cells_t)
        .filter(F.col("vec_id").isin(*list(dead_ids)[:50]))
        .count()
        == 0
    )
    idx.delete(dead)  # idempotent re-delete
    assert probe_rows() == want


def test_quantizer_frozen_and_seed_guard(spark):
    """train_centroids raises loudly on a bootstrap corpus smaller
    than the cell count (a silent short model would mis-assign every
    later batch), and returns exactly N_CELLS centroids otherwise."""
    import pytest

    rows = [(i, [float((i * 7 + j) % 5) for j in range(4)]) for i in range(3)]
    tiny = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="need >="):
        train_centroids(tiny)
    rows = [(i, [float((i * 7 + j) % 5) for j in range(4)]) for i in range(24)]
    ok = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    model = train_centroids(ok)
    assert len(model) == N_CELLS and all(len(c) == 4 for c in model)
