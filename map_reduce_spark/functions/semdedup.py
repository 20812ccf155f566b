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
from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_spread, parquet_num_rows

SEMDEDUP_TAU = 0.93
# The paper's scale knob: K grows with the corpus so cluster sizes —
# and therefore the per-cluster GEMM — stay bounded (they use 50k
# clusters for LAION). The registered query derives K from the
# corpus row count at this target.
SEMDEDUP_TARGET_CLUSTER = 2500

_SD_SCHEMA = (
    "vec_id BIGINT NOT NULL, cluster_id INT NOT NULL, "
    "kept BOOLEAN NOT NULL"
)


def semdedup_verdicts(
    emb: DataFrame, k: int = KM_K, iters: int = KM_ITERS,
    tau: float = SEMDEDUP_TAU,
) -> DataFrame:
    """Core pipeline on any (vec_id, dv, norm) frame: cluster with
    Lloyd's, then within-cluster drop-higher-id at cosine >= tau.
    The planted-duplicate fuzz (tests/test_semdedup.py) runs here;
    the registered query wraps it over the embeddings fixture."""
    import pandas as pd

    centroids = lloyd_kmeans(emb, "vec_id", "dv", k, iters)
    assigned = kmeans_assign(emb, "dv", centroids, "cluster").select(
        "vec_id", "dv", "norm", "cluster"
    )

    # Within-cluster dedup as one BLAS pass per cluster: each cluster's
    # members gather on one executor (groupBy cluster — this locality
    # is exactly what the clustering bought), the full cosine matrix is
    # one float64 GEMM, and b drops iff some lower-id member covers it
    # at >= tau. numpy GEMM replaces the expression-fold pair join
    # (measured 31.8 s -> see BASELINE note at sf1): ~n_c^2·D fused
    # multiply-adds instead of 25M codegen'd array folds. Same kernel
    # family as the dense-regime dedup (dedup.py blocked GEMM); the
    # per-cluster matrix is bounded because K scales with corpus size
    # (SEMDEDUP_TARGET_CLUSTER below), the paper's own knob.
    def dedup_cluster(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        x = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["dv"]]
        )
        norms = pdf["norm"].to_numpy(dtype=np.float64)
        cos = (x @ x.T) / np.outer(norms, norms)
        covered = np.triu(cos >= tau, 1).any(axis=0)  # lower-id cover
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cluster_id": np.int32(key[0]),
                "kept": ~covered,
            }
        )

    return (
        assigned.groupBy("cluster")
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
        return semdedup_verdicts(emb, k=k)

    return deferred(spark, _SD_SCHEMA, build)
