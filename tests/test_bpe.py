"""BPE trainer/encoder/operator differential tests.

``doc_bpe_tokens`` is rows-only on the driver gate (iterative merges
are not SQL-expressible), so correctness rests here: the production
trainer (incremental pair-count updates) and encoder (greedy
lowest-rank loop) are checked against INDEPENDENT naive
implementations — recount-from-scratch training, leftmost-scan
sequential merge application — plus a hand-computed classic example,
an end-to-end count differential on the real fixture, and the
deferred-builder laziness contract.
"""

from __future__ import annotations

import re

import pytest

from map_reduce_spark.functions.bpe import (
    BPE_N_MERGES,
    EOW,
    bpe_merge_list,
    doc_bpe_tokens,
    encode_word,
    train_merges,
)


# --- independent naive reference implementations ---------------------


def naive_train(word_counts, n_merges):
    """Recount every pair from scratch each round (no incremental
    updates — a different algorithm shape from the production
    trainer), same tie-break: count DESC, pair ASC."""
    words = [(list(w) + [EOW], c) for w, c in word_counts]
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, c in words:
            for pair in zip(syms, syms[1:]):
                pc[pair] = pc.get(pair, 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] <= 0:
            break
        left, right = best[0]
        merges.append((left, right))
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i : i + 2] = [left + right]
                else:
                    i += 1
    return merges


def naive_encode(word, merges):
    """Apply merges strictly in training order, leftmost-first within
    each merge — the classic formulation; must agree with the
    production greedy-lowest-rank encoder."""
    syms = list(word) + [EOW]
    for left, right in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == left and syms[i + 1] == right:
                syms[i : i + 2] = [left + right]
            else:
                i += 1
    return syms


CLASSIC = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_classic_example_first_merges():
    """The textbook corpus: ('e','s') with count 9 must merge first,
    then ('es','t') with 9."""
    merges = train_merges(CLASSIC, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


def test_trainer_matches_naive_recount():
    for wc in (
        CLASSIC,
        [("aaaa", 10), ("aab", 7), ("abab", 3), ("b", 1)],
        [("xy", 1)],
        [],
    ):
        assert train_merges(wc, 16) == naive_train(wc, 16), wc


def test_encoder_matches_naive_sequential_application():
    merges = train_merges(CLASSIC, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("low", "lower", "newest", "widest", "lowest", "news", "zzz"):
        assert encode_word(w, ranks) == naive_encode(w, merges), w


def test_encode_word_concatenation_invariant():
    merges = train_merges(CLASSIC, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("low", "newest", "outofvocab"):
        pieces = encode_word(w, ranks)
        assert "".join(pieces) == w + EOW


def test_operator_counts_match_naive_end_to_end(spark, sf_dir):
    """Full differential on the real fixture: per-doc piece counts
    from the distributed plan must equal counting pieces word-by-word
    in pure Python over the same tokenization."""
    import duckdb

    got = {r.doc_id: (r.n_tokens, r.n_bpe_tokens) for r in
           doc_bpe_tokens(spark, sf_dir).collect()}
    merges = bpe_merge_list(spark, sf_dir)
    ranks = {p: i for i, p in enumerate(merges)}
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    piece_count_cache: dict[str, int] = {}
    for doc_id, text in docs:
        words = [w for w in re.split(r"[^a-z]+", text.lower()) if w]
        n_bpe = 0
        for w in words:
            if w not in piece_count_cache:
                piece_count_cache[w] = len(encode_word(w, ranks))
            n_bpe += piece_count_cache[w]
        assert got[doc_id] == (len(words), n_bpe), doc_id


def test_builder_is_deferred(spark, sf_dir):
    from map_reduce_spark.plans.deferred import DeferredDataFrame

    df = doc_bpe_tokens(spark, sf_dir)
    assert isinstance(df, DeferredDataFrame)
    # schema surface served without materializing
    assert df.columns == ["doc_id", "n_tokens", "n_bpe_tokens"]


def test_merge_table_session_cached(spark, sf_dir):
    a = bpe_merge_list(spark, sf_dir)
    assert a is bpe_merge_list(spark, sf_dir)
    assert 0 < len(a) <= BPE_N_MERGES
