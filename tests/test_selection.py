"""Property tests for DSIR importance selection (functions/selection.py).

Value-level correctness is oracle-gated at sf0.001/0.01/0.1; these pin
the semantics the hash doesn't name: the selection actually enriches
toward the target distribution, ranks are dense, and the cross-engine
feature hash agrees with DuckDB bucket-for-bucket.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_spark.functions.selection import NB, TARGET_LANG, _bucket
from map_reduce_spark.registry import load_all
from map_reduce_spark.sources import load_table


def test_dsir_enriches_target_language(spark, sf_dir):
    """The top-K under DSIR weights must hold a strictly higher share
    of target-language documents than the raw corpus — that is the
    operator's entire purpose."""
    out = load_all()["doc_dsir_select"].builder(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    corpus_share = (
        docs.filter(F.col("lang") == TARGET_LANG).count() / docs.count()
    )
    sel_share = sum(1 for r in out if r["lang"] == TARGET_LANG) / len(out)
    assert sel_share > corpus_share
    # and ranks are dense 1..K with weights non-increasing
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    ws = [r["log_weight"] for r in out]
    assert all(a >= b for a, b in zip(ws, ws[1:]))


def test_feature_hash_matches_duckdb(spark, duck):
    """The md5 bucket idiom produces identical bucket ids in both
    engines for a token sample (the cross-engine contract the oracle
    relies on)."""
    toks = ["the", "ein", "les", "zhong", "quality", "x"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    spark_buckets = {
        r["tok"]: r["b"]
        for r in df.select("tok", _bucket(F.col("tok")).alias("b")).collect()
    }
    for t in toks:
        (b,) = duck.execute(
            f"SELECT ('0x' || substr(md5('{t}'), 1, 8))::BIGINT % {NB}"
        ).fetchone()
        assert spark_buckets[t] == b, t
