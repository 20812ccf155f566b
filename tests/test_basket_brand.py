"""basket_brand_rules_pct: the bitmask fast path and the generic
array-pair fallback are two implementations of one contract — pin
them row-equal on the fixture (the fixture's 25-brand vocabulary
always selects the bitmask path, so the fallback would otherwise be
dead code until a wide-vocabulary corpus shows up)."""

from __future__ import annotations


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_bitmask_and_array_fallback_agree(spark, sf_dir, monkeypatch):
    import map_reduce_spark.operators.basket as B
    from map_reduce_spark.registry import load_all

    reg = load_all()
    fast = rows(reg["basket_brand_rules_pct"].builder(spark, sf_dir))
    assert len(fast) > 0
    monkeypatch.setattr(B, "BRAND_BITMASK_MAX_ITEMS", 0)
    slow = rows(reg["basket_brand_rules_pct"].builder(spark, sf_dir))
    assert fast == slow


def test_support_floor_is_integer_exact(spark, sf_dir):
    """Every emitted pair satisfies the pure-integer boundary
    predicate 100 * n_both >= n_orders, and support/confidence/lift
    are consistent rationals."""
    from map_reduce_spark.registry import load_all
    from map_reduce_spark.sources import load_table

    out = load_all()["basket_brand_rules_pct"].builder(spark, sf_dir)
    n_orders = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    for r in out.collect():
        assert r.n_both * 100 >= n_orders
        assert abs(r.support - round(r.n_both / n_orders, 6)) < 1e-9
        assert 0.0 < r.confidence_a_to_b <= 1.0
        assert r.lift > 0.0
