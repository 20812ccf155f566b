"""Maintained-index ANN ingest: the embedding-serving twin of the
dedup ingest loop (r10 verdict item 4).

``sim_knn_ivf`` (similarity.py) is the SELF-CONTAINED statement of
IVF search: every call retrains the coarse quantizer (session-cached
away inside one session) and reassigns the whole corpus to cells
before probing. A 100 TB pipeline serving embeddings does neither —
it trains the quantizer ONCE on a bootstrap corpus, persists the
cell-assigned vectors as a partitioned index table, and then runs a
continuous loop of "search the new batch against the index as of now,
then fold the batch into its cells". This module is that loop, built
on the same managed-bucketed-table machinery as
``dedup_ingest.DedupIngestIndex``:

State:

- driver-side model: the centroid table (N_CELLS x 64 doubles — tiny
  by construction; the coarse quantizer is FROZEN at bootstrap, which
  is the production semantic: FAISS/Milvus-style IVF indexes assign
  new vectors to existing cells and treat quantizer retraining as a
  rebuild event, not maintenance).
- ``<name>_cells`` (vec_id, dv, norm, cell), bucketed by cell — the
  cell-assigned corpus vectors. dv/norm are precomputed once at
  ingest (the with_norm hoist), so steady-state probes never touch
  float32 payloads or recompute norms.

Per-batch cost decomposition (measured by tools/sim_ingest_ladder.py,
SIM_INGEST_LADDER_r11.json):

- PROBE: batch's probe vectors are assigned to their n_probe nearest
  cells against the frozen centroids (map-only, centroids folded in
  as literals) and broadcast into the index scan — per-probe work is
  ~n_probe/N_CELLS of the index, the IVF contract, and the index
  side NEVER shuffles (broadcast-hash join over the scan; the only
  Exchange in the whole probe plan is the pair-stream window's, on
  probe_id — plan-pinned in tests/test_sim_ingest.py). Broadcast is
  the serving regime by construction: query batches are
  operator-bounded, not corpus-proportional. A probe load that
  outgrew broadcast would repartition the PAIR stream by probe_id
  (the retrieval trio's large-probe move), never shuffle the index.
- MAINTENANCE: one batch-sized assignment + append, cell-clustered
  by the bucket layout (so compaction/rebuild scans read
  cell-local). Nothing corpus-sized is rewritten; the rebuild path
  pays quantizer retraining + full corpus reassignment EVERY batch.

Correctness gate (rows-only by construction — the trained centroids
are engine-side state, same sanction as sim_knn_ivf): pytest runs the
full loop at n_probe = N_CELLS, where IVF degrades to exact search,
and pins each epoch's results EQUAL to a brute-force top-k over the
index as of that epoch (bit-identical scores — same dot-product fold
order as sim_knn_bruteforce); recall@k at the default n_probe is
floor-checked against the same reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from map_reduce_spark.functions.similarity import (
    KMEANS_ITERS,
    N_CELLS,
    N_PROBE,
    TOP_K,
    _with_nearest_cells,
    dot_nc,
    with_norm,
)
from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_spread, session_cached

# Probe selection inside each ingest batch: vec_id = 8j + r within a
# mod-8 epoch residue class, probe iff j % SIM_INGEST_PROBE_STRIDE ==
# 0 → 4% of every batch. (vec_id % PROBE_MOD, the flat entries' rule,
# is EMPTY on odd mod-8 residues — 100 ≡ 4 (mod 8) never hits them.)
SIM_INGEST_PROBE_STRIDE = 25
# ...capped at this many probes per batch (j // STRIDE < CAP): a
# serving loop's query load is OPERATOR-BOUNDED, not
# corpus-proportional — the module docstring's own contract, which an
# uncapped 4%-of-batch rule violated at scale (the first r11 sf10
# sweep measured the registered entry at 430 s, ~3/4 of it probe dot
# products that grew with the batch). The cap never binds below
# STRIDE x CAP x 8 = 50k vectors (all three pytest scales), so the
# small-sf differential gates see identical probe sets; at sf10 each
# batch searches its first 250 scheduled probes — fixed query load,
# the regime the ladder's sf1 rung measures.
SIM_INGEST_MAX_PROBES_PER_BATCH = 250


def train_centroids(emb: DataFrame, n_cells: int = N_CELLS) -> list[list[float]]:
    """K-means coarse quantizer over an arbitrary (vec_id, embedding)
    frame — the bootstrap-corpus generalization of
    ``similarity.ivf_centroids`` (same seeding, same iteration count,
    same cosine assignment), returning the driver-side model. The
    collect()s are model-sized (n_cells x dim doubles and one
    (cell, pos) mean table per iteration), the sanctioned bounded
    class."""
    emb = with_norm(emb, "embedding", "dv", "norm")
    init = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(n_cells).collect()
    )
    centroids = [[float(x) for x in r.embedding] for r in init]
    if len(centroids) != n_cells:
        raise ValueError(
            f"bootstrap corpus has only {len(centroids)} vectors; "
            f"need >= {n_cells} to seed the IVF quantizer"
        )
    for _ in range(KMEANS_ITERS):
        assigned = _with_nearest_cells(
            emb, "dv", "norm", centroids, 1, "cells"
        ).withColumn("cell", F.col("cells")[0])
        rows = (
            assigned.select("cell", F.posexplode("dv").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        new = {r.cell: centroids[r.cell][:] for r in rows}
        for r in rows:
            new[r.cell][r.pos] = float(r.m)
        centroids = [new.get(i, centroids[i]) for i in range(n_cells)]
    return centroids


class SimIngestIndex:
    """Handle to a maintained IVF index: frozen centroids + a bucketed
    cell-assignment table. ``bootstrap`` pays the one-time training
    and initial assignment; ``ingest`` searches a vector batch against
    the index as of now and folds the batch into its cells."""

    def __init__(self, spark: SparkSession, name: str, n_buckets: int = 8):
        self.spark = spark
        self.n_buckets = n_buckets
        self.cells_t = f"{name}_cells"
        self.tomb_t = f"{name}_tomb"
        self.res_t = f"{name}_results"
        self.centroids: list[list[float]] | None = None
        self._seq = 0

    def _assign(self, emb: DataFrame, n: int, out: str) -> DataFrame:
        return _with_nearest_cells(
            with_norm(emb, "embedding", "dv", "norm"),
            "dv",
            "norm",
            self.centroids,
            n,
            out,
        )

    def _append_cells(self, batch: DataFrame, mode: str) -> None:
        (
            self._assign(batch, 1, "cells")
            .select("vec_id", "dv", "norm", F.col("cells")[0].alias("cell"))
            .write.format("parquet")
            .mode(mode)
            .bucketBy(self.n_buckets, "cell")
            .sortBy("cell")
            .saveAsTable(self.cells_t)
        )

    def bootstrap(self, corpus: DataFrame) -> "SimIngestIndex":
        """Train the quantizer on ``corpus`` (frozen thereafter) and
        write its cell assignments — dropping any prior state,
        including orphaned warehouse directories (the dedup-ingest
        crash-recovery discipline)."""
        import shutil
        from urllib.parse import urlparse

        warehouse = self.spark.conf.get("spark.sql.warehouse.dir")
        for t in (self.cells_t, self.tomb_t, self.res_t):
            self.spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(urlparse(f"{warehouse}/{t}").path, ignore_errors=True)
        self._seq = 0
        self.centroids = train_centroids(corpus)
        self._append_cells(corpus, "overwrite")
        self.spark.createDataFrame([], "vec_id long").write.format(
            "parquet"
        ).mode("overwrite").saveAsTable(self.tomb_t)
        return self

    def delete(self, ids: DataFrame) -> None:
        """Retract vectors from the index (r11 verdict item 5 — the
        ANN twin of DedupIngestIndex.delete): a takedown carries ids
        only, so deletion is a tombstone append; every probe excludes
        tombstoned vectors via a broadcast anti-join (the tombstone
        set is takedown-sized by contract), and ``compact`` reclaims
        the cell rows physically. The frozen quantizer is untouched —
        deletion changes cell OCCUPANCY, not cell geometry, exactly
        as in FAISS/Milvus IVF deletes."""
        (
            ids.select("vec_id")
            .join(self.spark.table(self.tomb_t), "vec_id", "left_anti")
            .localCheckpoint(eager=True)
            .write.format("parquet")
            .mode("append")
            .saveAsTable(self.tomb_t)
        )

    def compact(self) -> None:
        """Physically drop tombstoned cell rows and per-epoch small
        files: one exchange-free rewrite (bucket-layout read ->
        same-``bucketBy`` write via write-temp / drop / rename), then
        truncate the tombstones. Off the serving path — probes are
        correct before and after; compaction only restores file-count
        and scan-size floors (COMPACTION_LADDER_r12.json)."""
        tmp = f"{self.cells_t}_compacting"
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        (
            self.spark.table(self.cells_t)
            .join(F.broadcast(self.spark.table(self.tomb_t)), "vec_id", "left_anti")
            .write.format("parquet")
            .mode("overwrite")
            .bucketBy(self.n_buckets, "cell")
            .sortBy("cell")
            .saveAsTable(tmp)
        )
        self.spark.sql(f"DROP TABLE {self.cells_t}")
        self.spark.sql(f"ALTER TABLE {tmp} RENAME TO {self.cells_t}")
        self.spark.createDataFrame([], "vec_id long").write.format(
            "parquet"
        ).mode("overwrite").saveAsTable(self.tomb_t)

    def probe(self, probes: DataFrame, n_probe: int = N_PROBE) -> DataFrame:
        """Top-k over the CURRENT index for each (vec_id, embedding)
        probe row, without maintenance — one lazy plan over the
        bucketed cell table. Probe vectors are broadcast (query loads
        are batch-sized); the index side reads in bucket layout and
        never shuffles."""
        index = (
            self.spark.table(self.cells_t)
            # tombstone exclusion (r12): deleted vectors stay physical
            # until compact(); the anti-join side is takedown-sized
            # and broadcast, so the index scan stays shuffle-free
            .join(
                F.broadcast(self.spark.table(self.tomb_t)),
                "vec_id",
                "left_anti",
            )
            .select(F.col("vec_id").alias("neighbor_id"), "dv", "norm", "cell")
        )
        p = self._assign(probes, n_probe, "cells").select(
            F.col("vec_id").alias("probe_id"),
            F.col("dv").alias("probe_dv"),
            F.col("norm").alias("probe_norm"),
            F.explode("cells").alias("cell"),
        )
        cand = index.join(F.broadcast(p), ["cell"]).filter(
            F.col("neighbor_id") != F.col("probe_id")
        )
        # same fold order as sim_knn_bruteforce -> bit-identical scores
        scored = cand.withColumn(
            "score_raw",
            dot_nc("probe_dv", "dv")
            / (F.col("probe_norm") * F.col("norm")),
        ).drop("dv", "probe_dv")
        w = W.partitionBy("probe_id").orderBy(
            F.desc("score_raw"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select(
                "probe_id",
                "neighbor_id",
                F.round("score_raw", 6).alias("score"),
                "rank",
            )
            .orderBy("probe_id", "rank")
        )

    def ingest(
        self, batch: DataFrame, probes: DataFrame, n_probe: int = N_PROBE
    ) -> DataFrame:
        """Search ``probes`` (a subset of ``batch``) against the index
        as of now, durably sink the results, then fold ``batch`` into
        its cells. Eager by necessity, results sunk BEFORE the append
        (a lazily-persisted result plan reads the cells TABLE, and a
        table append invalidates dependent caches — a post-append
        action would recompute the search against an index containing
        the batch itself; the dedup-ingest ordering discipline)."""
        seq = self._seq
        self._seq += 1
        (
            self.probe(probes, n_probe)
            .withColumn("batch_seq", F.lit(seq).cast("long"))
            .write.format("parquet")
            .mode("append")
            .saveAsTable(self.res_t)
        )
        self._append_cells(batch, "append")
        return (
            self.spark.table(self.res_t)
            .filter(F.col("batch_seq") == seq)
            .drop("batch_seq")
            .orderBy("probe_id", "rank")
        )


# ---------------------------------------------------------------------------
# Registered fixed-epoch ingest run: the serving loop on the driver's
# rows-only gate (trained centroids are engine-side state, so no SQL
# oracle — pytest pins the full-probe ≡ as-of-epoch brute force
# equality instead; same sanction as sim_knn_ivf).
# ---------------------------------------------------------------------------
#
# Epoch schedule over the embeddings fixture, by vec_id % 8 (disjoint,
# deterministic, fixture-independent — the dedup_ingest_epochs
# schedule verbatim):
#   bootstrap corpus : vec_id % 8 NOT IN (1, 3, 5)   (~5/8 of vectors)
#   batch 0          : vec_id % 8 = 1
#   batch 1          : vec_id % 8 = 3
#   batch 2          : vec_id % 8 = 5
# Each batch is searched against the index AS OF its epoch (bootstrap
# plus all earlier batches — so batch 1's probes can retrieve batch
# 0's vectors) and then folded in: the maintained-state semantics a
# single lazy plan cannot express.
_EPOCH_MODS = (1, 3, 5)
# Retraction epoch (r12, r11 verdict item 5 — mirrors
# dedup_ingest's schedule): after batch 0 folds in, vectors with
# vec_id % 16 == 2 (a bootstrap slice — residue 2 mod 8 is never a
# batch residue) are taken down; batches 1 and 2 search the index
# minus the deleted vectors. The pytest full-probe differential
# recomputes each epoch's brute-force reference from the merged
# (insert - delete) corpus, so the tombstone exclusion is certified
# at n_probe = N_CELLS exactly like the append path.
_DELETE_MOD16 = 2
_DELETE_AFTER_BATCH = 0


def _epoch_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[tuple[DataFrame, DataFrame]]]:
    emb = load_spread(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    residue = F.col("vec_id") % 8
    j = (F.col("vec_id") / 8).cast("long")
    is_probe = (j % SIM_INGEST_PROBE_STRIDE == 0) & (
        j / SIM_INGEST_PROBE_STRIDE < SIM_INGEST_MAX_PROBES_PER_BATCH
    )
    boot = emb.filter(~residue.isin(*_EPOCH_MODS))
    batches = [
        (emb.filter(residue == m), emb.filter((residue == m) & is_probe))
        for m in _EPOCH_MODS
    ]
    return boot, batches


def run_ingest_epochs(
    spark: SparkSession, sf_dir: str, n_probe: int = N_PROBE
) -> DataFrame:
    """Execute the fixed-epoch loop (bootstrap + three ingests) and
    return the durable result log (batch_seq, probe_id, neighbor_id,
    score, rank). Parameterized on n_probe for the pytest full-probe
    differential and the ladder tool."""
    import hashlib

    key = hashlib.md5(
        f"{spark.sparkContext.applicationId}|{sf_dir}|{n_probe}".encode()
    ).hexdigest()[:10]
    idx = SimIngestIndex(spark, f"sim_ingest_{key}")
    boot, batches = _epoch_frames(spark, sf_dir)
    idx.bootstrap(boot)
    for seq, (batch, probes) in enumerate(batches):
        idx.ingest(batch, probes, n_probe)
        if seq == _DELETE_AFTER_BATCH:
            idx.delete(
                boot.filter(F.col("vec_id") % 16 == _DELETE_MOD16).select(
                    "vec_id"
                )
            )
    return (
        spark.table(idx.res_t)
        .select("batch_seq", "probe_id", "neighbor_id", "score", "rank")
        .orderBy("batch_seq", "probe_id", "rank")
    )


@session_cached
def _ingest_epoch_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_ingest_epochs(spark, sf_dir, N_PROBE)


@register("sim_ingest_epochs", oracle_sql=None)
def sim_ingest_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained-index ANN serving loop as a driver-gated query (r10
    verdict item 4; delete epoch r12, r11 verdict item 5): train an
    IVF quantizer on ~5/8 of the embedding corpus, persist the
    cell-assigned index as a bucketed table, then ingest three fixed
    vector batches in sequence — each batch's probe subset (4%) is
    searched top-k against the index AS OF its epoch, results
    durably sunk, and the batch folded into its cells. Between
    batches 0 and 1 a deterministic bootstrap slice (vec_id % 16 ==
    2) is RETRACTED (tombstones; the frozen quantizer is untouched —
    deletes change cell occupancy, not geometry), so batches 1 and 2
    can never retrieve a taken-down vector. Returns the result log:
    (batch_seq, probe_id, neighbor_id, score, rank).

    Rows-only by construction (the trained centroids are engine-side
    state — the sim_knn_ivf sanction); the correctness gate is the
    pytest differential in tests/test_sim_ingest.py: at n_probe =
    N_CELLS the loop's every epoch is pinned EQUAL to a brute-force
    top-k over the index as of that epoch, and default-n_probe
    recall@k is floor-checked against the same reference.

    DEFERRED + session-cached: the loop materializes each epoch's
    results before appending (see SimIngestIndex.ingest); one run per
    (session, corpus). Scale: per-batch cost is probe-side-only —
    assignment is map-only against the frozen centroids, the index
    side of the search never shuffles (broadcast probes over the
    bucketed scan), and maintenance appends one batch-sized frame;
    the rebuild alternative pays quantizer retraining plus a full
    corpus reassignment per batch (measured ladder:
    SIM_INGEST_LADDER_r11.json).
    """
    from map_reduce_spark.plans.deferred import deferred

    return deferred(
        spark,
        "batch_seq BIGINT NOT NULL, probe_id BIGINT, neighbor_id BIGINT, "
        "score DOUBLE, rank INT",
        lambda: _ingest_epoch_run(spark, sf_dir),
    )
