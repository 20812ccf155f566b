"""Fuzz the distributed skyline core against a quadratic reference.

The oracle gate proves the part query; this proves the REWRITE on
adversarial inputs — duplicates, equal-price groups, equal-size rows,
degenerate single-bucket and all-distinct datasets — where dominance
strictness corners live.
"""

from __future__ import annotations

import random

import pytest

from map_reduce_spark.operators.skyline import skyline_min_max


def _quadratic_skyline(rows):
    """O(n^2) reference: keep (id, cents, size) not dominated."""
    out = []
    for i, (ki, ci, si) in enumerate(rows):
        dominated = any(
            cj <= ci and sj >= si and (cj < ci or sj > si)
            for j, (kj, cj, sj) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append(ki)
    return sorted(out)


@pytest.mark.parametrize("seed,n,grid", [
    (0, 80, 10),    # heavy duplicates: 10x10 value grid
    (1, 120, 1000), # mostly distinct
    (2, 50, 3),     # degenerate: 3 price points only
    (3, 200, 40),
])
def test_skyline_matches_quadratic_reference(spark, seed, n, grid):
    rng = random.Random(seed)
    rows = [
        (i, rng.randrange(grid) * 7, rng.randrange(grid))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id bigint, cents long, size int")
    got = sorted(
        r["id"] for r in skyline_min_max(df, "cents", "size").collect()
    )
    assert got == _quadratic_skyline(rows)


def test_exact_duplicates_both_survive(spark):
    """Identical points do not dominate each other — both stay."""
    rows = [(1, 100, 5), (2, 100, 5), (3, 200, 4)]
    df = spark.createDataFrame(rows, "id bigint, cents long, size int")
    got = sorted(
        r["id"] for r in skyline_min_max(df, "cents", "size").collect()
    )
    assert got == [1, 2]  # 3 is dominated (pricier AND smaller)
