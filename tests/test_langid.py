"""Trained n-gram language ID (doc_langid_ngram).

The registered fixture corpus shares one vocabulary across ``lang``
labels, so the oracle gate proves cross-engine train+classify parity
but cannot prove the classifier discriminates. These tests close that
gap on a synthetic corpus whose languages ARE separable, and pin the
scale-critical plan property (the profile side is broadcast).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from map_reduce_spark.functions.text import (
    LANGID_PROFILE_K,
    doc_langid_ngram,
)


def _write_corpus(tmp_path, rows):
    d = str(tmp_path / "langid_sf")
    os.makedirs(d, exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["src0"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{d}/documents.parquet")
    return d


# Two synthetic "languages" with disjoint character inventories —
# trigram profiles cannot overlap, so a working classifier must get
# 100% accuracy on held-in docs.
_AA_WORDS = ["aba", "bab", "abba", "baab"]
_CC_WORDS = ["cdc", "dcd", "cddc", "dccd"]


def _doc(words, i, n=12):
    return " ".join(words[(i + j) % len(words)] for j in range(n))


def test_separable_languages_classified_correctly(spark, tmp_path):
    rows = []
    for i in range(8):
        rows.append((i, _doc(_AA_WORDS, i), "aa"))
    for i in range(8):
        rows.append((8 + i, _doc(_CC_WORDS, i), "cc"))
    d = _write_corpus(tmp_path, rows)
    out = doc_langid_ngram(spark, d).collect()
    assert len(out) == 16
    for r in out:
        assert r.pred_lang == r.lang, (r.doc_id, r.lang, r.pred_lang)
        assert r.score > 0


def test_short_and_empty_docs_fall_back_to_und(spark, tmp_path):
    # <3-char docs produce no trigrams -> no profile match -> 'und'
    # with score 0; they must still appear in the output (left join).
    rows = [
        (0, _doc(_AA_WORDS, 0), "aa"),
        (1, "x", "aa"),
        (2, "", "aa"),
    ]
    d = _write_corpus(tmp_path, rows)
    out = {r.doc_id: r for r in doc_langid_ngram(spark, d).collect()}
    assert set(out) == {0, 1, 2}
    assert out[1].pred_lang == "und" and out[1].score == 0
    assert out[2].pred_lang == "und" and out[2].score == 0
    assert out[0].pred_lang == "aa"


def test_profile_bounded_and_tiebreak_deterministic(spark, tmp_path):
    # A one-doc corpus where every trigram count ties at 1: the
    # profile must keep exactly min(K, |tris|) rows ranked by
    # trigram ASC, and two runs must agree bit-for-bit.
    text = "abcdefghij"  # 8 distinct trigrams, all count 1
    d = _write_corpus(tmp_path, [(0, text, "aa")])
    a = doc_langid_ngram(spark, d).collect()
    b = doc_langid_ngram(spark, d).collect()
    assert a == b
    # 8 trigrams, each weight K+1-rank with rank by tri asc ->
    # weights K..K-7; score = sum.
    expect = sum(LANGID_PROFILE_K + 1 - r for r in range(1, 9))
    assert a[0].score == expect


def test_profile_join_is_broadcast(spark):
    plan = doc_langid_ngram(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
