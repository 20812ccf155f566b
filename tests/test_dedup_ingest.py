"""Maintained-index incremental dedup (functions/dedup_ingest.py):
multi-batch differential against the from-scratch reference, the tie
back to the registered ``dedup_incremental_batch`` contract, the
bucketed-probe plan pin, and the cap-crossing hot-list edge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_spark.functions.dedup import SHINGLE_DF_CAP, INCREMENT_MOD
from map_reduce_spark.functions.dedup_ingest import (
    DedupIngestIndex,
    incremental_verdicts,
)
from map_reduce_spark.registry import load_all
from map_reduce_spark.sources import load_table


def _rows(df):
    return [
        (r["doc_id"], r["verdict"], r["match_doc"], r["jaccard"])
        for r in df.collect()
    ]


def test_reference_matches_registered_on_mod_split(spark, sf_dir):
    """incremental_verdicts on the registered MOD split must equal the
    registered (oracle-gated) builder — ties the arbitrary-frame
    reference to the driver-checked contract."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    is_inc = (F.col("doc_id") % INCREMENT_MOD) == 0
    got = incremental_verdicts(docs.filter(~is_inc), docs.filter(is_inc))
    want = load_all()["dedup_incremental_batch"].builder(spark, sf_dir)
    assert _rows(got) == _rows(want)


def _synthetic_corpus(spark, n_docs: int = 64):
    """(doc_id, text) frame with structure that exercises every path:
    a stock phrase shared by >SHINGLE_DF_CAP docs (so its shingles
    CROSS the cap partway through a sequential ingest), planted exact
    duplicates, planted near-duplicates, and unique tails. Tokens are
    LETTER-ONLY — the house tokenizer splits on [^a-z]+, so digits in
    synthetic tokens would silently collapse every tail to 'tok w'."""
    stock = "alpha beta gamma delta epsilon zeta eta theta"
    rows = []
    for i in range(n_docs):
        uid = chr(97 + i // 26) + chr(97 + i % 26)
        tail = " ".join(f"t{uid}w{chr(97 + j)}" for j in range(10))
        if i % 16 == 5:
            # exact duplicate of an earlier doc (i - 3 has same text)
            rows.append((i, rows[i - 3][1]))
        elif i % 16 == 9:
            # near duplicate: same long body as i-4, one token changed
            body = rows[i - 4][1].split()
            body[-1] = "changed"
            rows.append((i, " ".join(body)))
        elif i % 2 == 0:
            rows.append((i, f"{stock} {tail}"))
        else:
            rows.append((i, f"{tail} {tail}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_maintained_index_matches_reference_over_batches(spark, tmp_path):
    """Sequential 4-batch ingest: after bootstrap, every batch's
    verdict frame equals the from-scratch reference computed on
    (all prior docs, batch). The stock phrase's shingles cross
    SHINGLE_DF_CAP between batches, so the maintained df partials are
    exercised through a rare->hot transition (stored postings are
    uncapped truth; hotness decided at probe time)."""
    corpus = _synthetic_corpus(spark)
    batches = [corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
               for lo, hi in [(0, 16), (16, 32), (32, 48), (48, 64)]]
    # sanity: 10 docs per 16-block carry the stock phrase (8 evens +
    # the %16==5 copy + the %16==9 near-copy), so stock shingles are
    # under the cap with two blocks ingested (20 <= cap) and CROSS it
    # at three (30 > cap) — the rare->hot transition the maintained
    # df partials must get right.
    assert 20 <= SHINGLE_DF_CAP < 30

    idx = DedupIngestIndex(spark, "di_test", n_buckets=4).bootstrap(batches[0])
    seen = batches[0]
    for b in batches[1:]:
        got = idx.ingest(b)
        want = incremental_verdicts(seen, b)
        assert _rows(got) == _rows(want)
        seen = seen.unionAll(b)
    # every verdict kind occurred at least once across the ladder
    final = incremental_verdicts(seen.limit(0), seen.limit(0))  # schema only
    assert final.columns == ["doc_id", "verdict", "match_doc", "jaccard"]


def test_probe_plan_uses_bucket_layout(spark):
    """The postings/fingerprint/df scans read in bucket layout (the
    planner only keeps a bucketed scan when it removes an Exchange),
    so probe joins shuffle the BATCH side only — the maintained-index
    scale claim. Re-checked AFTER an append: per-batch maintenance
    must not degrade the tables to unbucketed scans, or every later
    probe silently re-shuffles the whole index."""
    corpus = _synthetic_corpus(spark, 32)
    idx = DedupIngestIndex(spark, "di_plan", n_buckets=4).bootstrap(corpus)
    batch = _synthetic_corpus(spark, 8).withColumn(
        "doc_id", F.col("doc_id") + 1000
    )

    def assert_bucketed():
        plan = idx.probe(batch)._jdf.queryExecution().executedPlan().toString()
        scans = [seg for seg in plan.split("FileScan")[1:]]
        # the tombstone list is deliberately UNBUCKETED (it is the
        # broadcast side of an anti-join, takedown-sized) — the
        # bucket-layout claim covers the three state tables
        bucketed = [
            s
            for s in scans
            if any(t in s[:200] for t in (idx.post_t, idx.fp_t, idx.dfp_t))
        ]
        assert bucketed, plan
        assert all("Bucketed: true" in s[:400] for s in bucketed), plan

    assert_bucketed()
    idx.ingest(batch.withColumn("doc_id", F.col("doc_id") + 2000))
    assert_bucketed()


def test_maintained_index_randomized_differential(spark):
    """Randomized multi-batch fuzz: small-vocabulary corpora (forced
    shingle collisions, hot shingles, exact and near duplicates by
    birthday collision) ingested through the maintained loop in
    random batch splits must match the from-scratch reference at
    every step — arbitrary-structure coverage the planted corpus
    can't give."""
    import random

    for trial in range(2):
        rng = random.Random(100 + trial)
        vocab = [f"w{chr(97 + i)}" for i in range(8)]
        rows = []
        for i in range(40):
            n = rng.randint(0, 12)  # includes <3-token docs (no shingles)
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        cuts = sorted(rng.sample(range(5, 40), 2))
        spans = [(0, cuts[0]), (cuts[0], cuts[1]), (cuts[1], 40)]
        idx = DedupIngestIndex(
            spark, f"di_fuzz{trial}", n_buckets=4
        ).bootstrap(corpus.filter(F.col("doc_id") < spans[0][1]))
        seen = corpus.filter(F.col("doc_id") < spans[0][1])
        for lo, hi in spans[1:]:
            b = corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            got = _rows(idx.ingest(b))
            want = _rows(incremental_verdicts(seen, b))
            assert got == want, (trial, lo, hi)
            seen = seen.unionAll(b)


def test_delete_epochs_match_reference_and_compact_is_invisible(spark):
    """r12 (r11 verdict item 5): after delete(), probe verdicts must
    equal the from-scratch reference over the LIVE (insert - delete)
    corpus. The planted deletion takes down 20 of the 40 stock-phrase
    docs, dropping the stock shingles' df from 40 (> cap, hot) back
    to 20 (<= cap, rare) — so the NEGATIVE df partials are exercised
    through a hot->rare transition, not just the tombstone filter: a
    batch near-copy of a live stock doc only clears the Jaccard
    threshold if the engine re-priced df correctly. compact() must
    change nothing observable while physically removing the rows;
    re-delete is idempotent; ingest after compact stays consistent."""
    corpus = _synthetic_corpus(spark)  # 64 docs, 40 carry the stock phrase
    idx = DedupIngestIndex(spark, "di_del", n_buckets=4).bootstrap(corpus)
    dead = corpus.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 40))
    assert dead.count() == 20
    idx.delete(dead.select("doc_id"))
    live = corpus.join(dead.select("doc_id"), "doc_id", "left_anti")

    # batch: a copy of a DELETED doc's unique text (must be 'keep' —
    # matching it would mean serving a taken-down doc), a copy of a
    # LIVE doc (exact_dup), and a near-copy of a live stock doc
    # (near_dup ONLY under correct post-delete df pricing)
    texts = {r.doc_id: r.text for r in corpus.collect()}
    near = texts[40].split()
    near[-1] = "changed"
    batch = spark.createDataFrame(
        [(1000, texts[0]), (1001, texts[44]), (1002, " ".join(near))],
        "doc_id long, text string",
    )
    got = _rows(idx.probe(batch))
    want = _rows(incremental_verdicts(live, batch))
    assert got == want
    by_id = {d: (v, m) for d, v, m, _ in got}
    assert by_id[1000][0] == "keep"  # deleted doc must not match
    assert by_id[1001] == ("exact_dup", 44)
    assert by_id[1002] == ("near_dup", 40)  # needs the df re-pricing

    idx.compact()
    assert _rows(idx.probe(batch)) == want
    assert (
        spark.table(idx.post_t)
        .join(dead.select("doc_id"), "doc_id", "left_semi")
        .count()
        == 0
    )
    idx.delete(dead.select("doc_id"))  # idempotent re-delete
    assert _rows(idx.probe(batch)) == want
    # maintenance after compact: fold the batch in, then a follow-up
    # probe against the grown live corpus still matches the reference
    idx.ingest(batch)
    batch2 = spark.createDataFrame(
        [(2000, texts[44]), (2001, texts[0])], "doc_id long, text string"
    )
    assert _rows(idx.probe(batch2)) == _rows(
        incremental_verdicts(live.unionAll(batch), batch2)
    )


def test_verdict_kinds_and_hot_crossing(spark):
    """End-state sanity on the synthetic corpus (split at 52 so the
    planted duplicates' sources are EXISTING — incoming x incoming
    pairs are by-design invisible, same as the registered query):
    exact dups resolve to the existing match, near-dups clear the
    threshold against the right doc, and stock-phrase docs in the
    batch are 'keep' because the stock shingles are HOT by now (26
    existing stock docs > cap) and their tails are unique."""
    corpus = _synthetic_corpus(spark)
    existing = corpus.filter(F.col("doc_id") < 52)
    batch = corpus.filter(F.col("doc_id") >= 52)
    out = {r["doc_id"]: r for r in incremental_verdicts(existing, batch).collect()}
    assert len(out) == 12
    # doc 53 is an exact duplicate of existing doc 50 (%16==5 -> copy of i-3)
    assert out[53]["verdict"] == "exact_dup" and out[53]["match_doc"] == 50
    # doc 57 (%16==9) is doc 53's text with one token changed = a near
    # duplicate of EXISTING doc 50 (doc 53 itself is in the batch and
    # therefore not matchable)
    assert out[57]["verdict"] == "near_dup" and out[57]["match_doc"] == 50
    assert out[57]["jaccard"] >= 0.6
    # a stock-phrase doc in the batch: stock shingles hot, tail unique
    assert out[62]["verdict"] == "keep"
