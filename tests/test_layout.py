"""Z-order layout tests: value-level correctness is on the oracle gate
(layout_zorder_stats); these pin the PRUNING property that justifies
the layout — a single-dimension range predicate touches a bounded
fraction of Z-buckets, while a layout sorted by the OTHER dimension
must scan nearly everything — and the bijectivity of the interleave.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_spark.operators import layout as L
from map_reduce_spark.sources import load_table


def _bucketed(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    ext = li.agg(
        F.min("l_partkey").alias("mnp"), F.max("l_partkey").alias("mxp"),
        F.min("l_suppkey").alias("mns"), F.max("l_suppkey").alias("mxs"),
    )
    g = li.crossJoin(F.broadcast(ext)).select(
        "l_partkey", "l_suppkey",
        F.expr(L._quantize_sql("l_partkey", "mnp", "mxp", "DIV")).alias("qx"),
        F.expr(L._quantize_sql("l_suppkey", "mns", "mxs", "DIV")).alias("qy"),
    )
    shl = lambda e, n: f"shiftleft({e}, {n})"  # noqa: E731
    return g.select(
        "l_partkey", "l_suppkey",
        F.expr(
            f"shiftright({L._interleave_sql('qx', 'qy', shl)}, {L.ZBUCKET_SHIFT})"
        ).alias("zbucket"),
        F.expr(L._interleave_sql("qx", "qy", shl)).alias("zval"),
        "qx", "qy",
    ).persist()


def test_zorder_prunes_both_dimensions(spark, sf_dir):
    """A narrow suppkey predicate touches a bounded fraction of
    Z-buckets; the partkey-sorted layout (the single-column
    alternative) must scan nearly every bucket for the same
    predicate. This asymmetry IS the reason to Z-order."""
    from pyspark.sql import Window as W

    df = _bucketed(spark, sf_dir)
    total_z = df.select("zbucket").distinct().count()
    one_supp = df.agg(F.min("l_suppkey")).collect()[0][0]
    z_touched = (
        df.filter(F.col("l_suppkey") == one_supp)
        .select("zbucket").distinct().count()
    )
    # partkey-sorted files: same bucket count, assigned by partkey rank
    ranked = df.withColumn(
        "pbucket", F.ntile(total_z).over(W.orderBy("l_partkey", "l_suppkey"))
    )
    p_touched = (
        ranked.filter(F.col("l_suppkey") == one_supp)
        .select("pbucket").distinct().count()
    )
    df.unpersist()
    assert z_touched / total_z <= 0.35, (z_touched, total_z)
    assert p_touched / total_z >= 0.60, (p_touched, total_z)
    assert z_touched < p_touched


def test_zorder_interleave_is_bijective_and_monotone_on_grid(spark, sf_dir):
    """Distinct (qx, qy) cells map to distinct zvals (the interleave
    is a bijection on the grid), and zval == 0 iff both quantized
    coords are 0."""
    df = _bucketed(spark, sf_dir)
    cells = df.select("qx", "qy", "zval").distinct().collect()
    df.unpersist()
    zvals = [r["zval"] for r in cells]
    assert len(set(zvals)) == len({(r["qx"], r["qy"]) for r in cells})
    for r in cells:
        assert (r["zval"] == 0) == (r["qx"] == 0 and r["qy"] == 0)
        assert r["zval"] >= 0


def test_morton_interleave_is_invertible_property():
    """Pure-Python property check of the generated interleave SQL's
    semantics: interleaving then de-interleaving recovers any 16-bit
    coordinate pair (so distinct grid cells can never collide), and
    the curve preserves the quadrant order that makes range pruning
    work."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def interleave(qx: int, qy: int) -> int:
        z = 0
        for i in range(L.ZBITS):
            z += ((qx >> i) & 1) << (2 * i)
            z += ((qy >> i) & 1) << (2 * i + 1)
        return z

    def deinterleave(z: int) -> tuple[int, int]:
        qx = qy = 0
        for i in range(L.ZBITS):
            qx |= ((z >> (2 * i)) & 1) << i
            qy |= ((z >> (2 * i + 1)) & 1) << i
        return qx, qy

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(0, (1 << L.ZBITS) - 1), st.integers(0, (1 << L.ZBITS) - 1)
    )
    def check(qx, qy):
        z = interleave(qx, qy)
        assert deinterleave(z) == (qx, qy)
        # top-bit quadrant order: the leading interleaved bits are the
        # coordinates' leading bits, so the 4 quadrants are contiguous
        # z ranges — the property bucket pruning relies on
        assert (z >> (2 * L.ZBITS - 1)) & 1 == (qy >> (L.ZBITS - 1)) & 1
        assert (z >> (2 * L.ZBITS - 2)) & 1 == (qx >> (L.ZBITS - 1)) & 1

    check()
