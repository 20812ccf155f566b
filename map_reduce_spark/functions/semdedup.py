"""SemDeDup: semantic deduplication via k-means cluster pruning.

The published recipe (Abbas et al., 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication" — public arXiv
paper): cluster the embedding space, then deduplicate ONLY within
clusters — pairs in different clusters are assumed non-duplicates, so
the quadratic pair work is bounded by the largest cluster instead of
the corpus. This composes two cores already in the engine: the
registered Lloyd's k-means (functions/clustering.py) and the
hoisted-norm cosine pair join (functions/similarity.py).

Keep rule (deterministic): within a cluster, a vector is DROPPED iff
some lower-id vector in the same cluster has cosine >= TAU to it —
the keep-lowest-id convention every dedup family in this repo uses.

Scale design (100 TB):
- Clustering cost: see clustering.py (map-only assigns + model-sized
  collects).
- The pair join is an equi-join on cluster id — hash-partitionable,
  each cluster's pairs computed where its members land. Cluster sizes
  bound the quadratic term: K scales with corpus size in the paper
  (they use 50k clusters for LAION) precisely to keep n_c^2 flat.
- Norms hoist before the join (with_norm), so the per-pair work is
  one dot product.
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
from map_reduce_spark.functions.similarity import dot, with_norm
from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_spread

SEMDEDUP_TAU = 0.93

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
    centroids = lloyd_kmeans(emb, "vec_id", "dv", k, iters)
    assigned = kmeans_assign(emb, "dv", centroids, "cluster").select(
        "vec_id", "dv", "norm", "cluster"
    )
    a = assigned.select(
        F.col("vec_id").alias("a_id"),
        F.col("dv").alias("a_dv"),
        F.col("norm").alias("a_norm"),
        F.col("cluster").alias("a_cluster"),
    )
    b = assigned.select(
        F.col("vec_id").alias("b_id"),
        F.col("dv").alias("b_dv"),
        F.col("norm").alias("b_norm"),
        F.col("cluster").alias("b_cluster"),
    )
    # Within-cluster ordered pairs (a < b): b is covered if cosine
    # clears TAU — then b drops, the lowest-id representative stays.
    dropped = (
        a.join(
            b,
            (F.col("a_cluster") == F.col("b_cluster"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .filter(
            dot(F.col("a_dv"), F.col("b_dv"))
            / (F.col("a_norm") * F.col("b_norm"))
            >= tau
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_drop", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cluster").alias("cluster_id"),
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
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
        return semdedup_verdicts(emb)

    return deferred(spark, _SD_SCHEMA, build)
