"""Differential tests for SemDeDup (functions/semdedup.py): the Spark
pipeline must match a numpy twin that re-runs clustering + the
within-cluster drop rule end-to-end — on the fixture embeddings
(near-orthogonal: everything survives, which the twin confirms) and
on randomized data with PLANTED near-duplicates, where the drop rule
actually fires.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from map_reduce_spark.functions.clustering import KM_ITERS, KM_K
from map_reduce_spark.functions.semdedup import (
    SEMDEDUP_TAU,
    semdedup_verdicts,
)
from map_reduce_spark.functions.similarity import with_norm
from map_reduce_spark.registry import load_all


def _numpy_semdedup(ids, x, k, iters, tau):
    """Twin: Lloyd's (same init/tie/empty rules as clustering.py),
    then drop any vector with a lower-id same-cluster neighbor at
    cosine >= tau."""
    cents = x[:k].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=-1)
        lab = d2.argmin(axis=1)
        for j in range(k):
            if (lab == j).any():
                cents[j] = x[lab == j].mean(axis=0)
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=-1)
    lab = d2.argmin(axis=1)
    norms = np.linalg.norm(x, axis=1)
    cos = (x @ x.T) / np.outer(norms, norms)
    dropped = set()
    for bi in range(len(ids)):
        for ai in range(bi):
            if lab[ai] == lab[bi] and cos[ai, bi] >= tau:
                dropped.add(int(ids[bi]))
                break
    return {int(i): int(lb) for i, lb in zip(ids, lab)}, dropped


def _check(spark, ids, x, k, iters, tau, expect_drops):
    rows_in = [
        (int(i), [float(v) for v in x[j]]) for j, i in enumerate(ids)
    ]
    df = with_norm(
        spark.createDataFrame(rows_in, "vec_id bigint, embedding array<double>"),
        "embedding",
        "dv",
        "norm",
    )
    got = semdedup_verdicts(df, k=k, iters=iters, tau=tau).collect()
    ref_lab, ref_dropped = _numpy_semdedup(ids, x, k, iters, tau)
    assert len(got) == len(ids)
    for r in got:
        assert ref_lab[r["vec_id"]] == r["cluster_id"], r
        assert r["kept"] == (r["vec_id"] not in ref_dropped), r
    if expect_drops:
        assert ref_dropped  # the scenario must exercise the drop rule


@pytest.mark.parametrize("seed", [0, 1])
def test_semdedup_drops_planted_duplicates(spark, seed):
    """Random base vectors plus planted near-copies (tiny noise):
    the Spark pipeline and the numpy twin agree vector-for-vector,
    and the planted copies actually drop."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(40, 6))
    dups = base[:10] + rng.normal(scale=1e-3, size=(10, 6))
    x = np.vstack([base, dups]).round(6)
    ids = np.arange(len(x)) * 3 + 1  # sparse id space
    _check(spark, ids, x.astype(np.float64), k=4, iters=3,
           tau=0.98, expect_drops=True)


def test_semdedup_cluster_collapse_guard(spark):
    """Skew guard (r7 verdict item 6): a COLLAPSED embedding corpus
    (every vector near one point, so one cluster swallows everything)
    must sub-split instead of landing the whole corpus-sized GEMM on
    one task. With max_cluster=16 and 60 vectors in one cluster the
    grouped kernel sees ceil(60/16)=4 sub-blocks; verdicts must match
    a twin that applies the documented sub-split rule (drop iff a
    lower-id vector in the same (cluster, vec_id mod n_sub) block
    covers it) — including pairs the split deliberately lets through.
    """
    rng = np.random.default_rng(7)
    center = rng.normal(size=6)
    center /= np.linalg.norm(center)
    x = (center[None, :] + rng.normal(scale=1e-3, size=(60, 6))).round(6)
    ids = np.arange(60) * 2 + 5
    max_cluster = 16
    k, iters, tau = 4, 2, 0.98

    rows_in = [(int(i), [float(v) for v in x[j]]) for j, i in enumerate(ids)]
    df = with_norm(
        spark.createDataFrame(rows_in, "vec_id bigint, embedding array<double>"),
        "embedding", "dv", "norm",
    )
    telemetry: dict = {}
    got = {
        r["vec_id"]: r
        for r in semdedup_verdicts(
            df, k=k, iters=iters, tau=tau, max_cluster=max_cluster,
            telemetry=telemetry,
        ).collect()
    }

    # Twin with the sub-split rule. The split key is
    # xxhash64(vec_id) mod n_sub (NOT vec_id mod n_sub — these ids
    # are all odd, a strided assignment that would defeat a plain
    # modulus and leave residues unpopulated); mirror it by asking
    # Spark for the same hash values.
    ref_lab, _ = _numpy_semdedup(ids, x.astype(np.float64), k, iters, tau)
    labs = np.array([ref_lab[int(i)] for i in ids])
    norms = np.linalg.norm(x, axis=1)
    cos = (x @ x.T) / np.outer(norms, norms)
    sizes = {c: int((labs == c).sum()) for c in set(labs.tolist())}
    n_sub = {c: -(-s // max_cluster) for c, s in sizes.items()}
    assert max(n_sub.values()) > 1  # the guard must actually engage
    # Split telemetry (r8 verdict item 6): the guard's engagement is
    # observable data, pinned here against the twin's cluster sizes.
    assert telemetry["n_clusters"] == len(sizes)
    assert telemetry["n_split_clusters"] == sum(
        1 for s in sizes.values() if s > max_cluster
    ) > 0
    assert telemetry["affected_vectors"] == sum(
        s for s in sizes.values() if s > max_cluster
    )
    assert telemetry["total_vectors"] == len(ids)
    hashes = {
        r["vec_id"]: r["h"]
        for r in spark.createDataFrame(
            [(int(i),) for i in ids], "vec_id bigint"
        )
        .select("vec_id", F.xxhash64("vec_id").alias("h"))
        .collect()
    }
    sub = {int(i): hashes[int(i)] % n_sub[labs[j]] for j, i in enumerate(ids)}
    dropped = set()
    for bi in range(len(ids)):
        for ai in range(bi):
            if (
                labs[ai] == labs[bi]
                and sub[int(ids[ai])] == sub[int(ids[bi])]
                and cos[ai, bi] >= tau
            ):
                dropped.add(int(ids[bi]))
                break
    for j, i in enumerate(ids):
        assert got[int(i)]["cluster_id"] == labs[j]
        assert got[int(i)]["kept"] == (int(i) not in dropped), int(i)
    # The scenario must exercise BOTH sides of the trade: drops fire
    # within sub-blocks, and at least one near-dup pair straddles
    # sub-blocks (the documented recall cost of the guard).
    assert dropped
    assert any(not got[int(i)]["kept"] for i in ids)
    assert any(
        got[int(i)]["kept"] for i in ids[1:]
    )  # later ids survive via the split


def test_semdedup_fixture_near_orthogonal_all_survive(spark, sf_dir):
    """On the fixture embeddings (max pairwise cosine ~0.48) nothing
    clears TAU: the registered manifest keeps every vector, and the
    cluster labels match the twin exactly."""
    out = load_all()["dedup_semdedup_embeddings"].builder(spark, sf_dir)
    rows = out.collect()
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    order = np.argsort(ids)
    x = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )[order]
    ref_lab, ref_dropped = _numpy_semdedup(
        ids[order], x, KM_K, KM_ITERS, SEMDEDUP_TAU
    )
    assert not ref_dropped
    assert all(r["kept"] for r in rows)
    assert {r["vec_id"]: r["cluster_id"] for r in rows} == ref_lab
