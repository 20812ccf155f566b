"""Zipf-vocabulary scale study for ``rag_chunk_tfidf_search`` (r6
verdict item 6).

The driver fixture's ~31-token vocabulary makes the retrieval join
degenerate (every posting list spans ~80% of the corpus — nothing can
prune), so the operator's Lucene-shape scaling claim — FIXED query
workload => cost tracks posting-list length, i.e. grows LINEARLY in
corpus size — was argued but unmeasured. This tool measures it:

1. generates synthetic document corpora at a geometric ladder of
   sizes, all drawing tokens from the SAME fixed 10^4-word Zipf(s)
   vocabulary (the realistic regime: vocabulary saturates, posting
   lists grow);
2. holds the PROBE COUNT fixed across sizes by scaling the probe
   modulus with the corpus (``_tfidf_search(probe_doc_mod ∝ N)``) —
   queries/sec does not grow with the index in a real search system;
3. times the Spark plan end-to-end at each size (min of R runs) and,
   at the smallest size, cross-checks Spark vs a DuckDB twin of the
   same parameterized query for correctness of the study pipeline;
4. reports per-size runtimes, growth ratios between adjacent doublings
   (linear => ~2x, quadratic => ~4x), and the posting-mass metric
   (sum over tokens of probe_df x corpus_df) that the runtime should
   track.

Usage:
  python tools/zipf_retrieval_study.py \
      [--sizes 2000,4000,8000,16000] [--vocab 10000] [--doc-tokens 120] \
      [--probe-docs 16] [--runs 2] [--out ZIPF_RETRIEVAL_STUDY_r07.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ZIPF_S = 1.07  # typical natural-language exponent


def make_corpus(out_dir: str, n_docs: int, vocab: int, doc_tokens: int, seed: int = 7) -> None:
    """Write documents.parquet: n_docs docs of ~doc_tokens tokens drawn
    iid from a fixed Zipf(s) distribution over `vocab` word types.

    The WORD LIST is independent of corpus size (seeded separately), so
    every scale point shares the identical vocabulary — the fixed-vocab
    regime the study is about. Document lengths jitter ±25% so chunk
    counts aren't lockstep.
    """
    os.makedirs(out_dir, exist_ok=True)
    wr = np.random.default_rng(123)  # vocabulary seed: FIXED across sizes
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = ["".join(wr.choice(letters, size=wr.integers(3, 9))) + str(i) for i in range(vocab)]
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = ranks ** (-ZIPF_S)
    probs /= probs.sum()

    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n_docs):
        ln = int(doc_tokens * rng.uniform(0.75, 1.25))
        idx = rng.choice(vocab, size=ln, p=probs)
        texts.append(" ".join(words[i] for i in idx))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n_docs, type=pa.string()),
            "source": pa.array(["zipf"] * n_docs, type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/documents.parquet")


def duckdb_twin_seconds(
    sf_dir: str, probe_doc_mod: int, op: str = "tfidf"
) -> tuple[float, list]:
    """DuckDB running the registered oracle SQL with the study's probe
    modulus substituted — the same parameterization the Spark side
    gets."""
    import duckdb

    from map_reduce_spark.functions.retrieval import (
        _BM25_SQL,
        _RETRIEVAL_SQL,
        PROBE_DOC_MOD,
    )

    base = _RETRIEVAL_SQL if op == "tfidf" else _BM25_SQL
    sql = base.replace(f"% {PROBE_DOC_MOD} = 0", f"% {probe_doc_mod} = 0")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    t0 = time.monotonic()
    rows = con.execute(sql).fetchall()
    return time.monotonic() - t0, rows


def posting_mass(sf_dir: str, probe_doc_mod: int) -> int:
    """Sum over tokens of probe_df x corpus_df after the DF cap — the
    join's intrinsic work metric the runtime should track."""
    import duckdb

    from map_reduce_spark.functions.retrieval import (
        CHUNK_STEP,
        CHUNK_TOKENS,
        CHUNKS_PER_DOC_CAP,
        RETRIEVAL_MAX_DF,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con.execute(f"""
    WITH toks_t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           t -> length(t) > 0) AS toks
        FROM documents),
    chunk_toks AS (
        SELECT doc_id * {CHUNKS_PER_DOC_CAP} + idx - 1 AS chunk_uid, unnest(win) AS token
        FROM (
            SELECT doc_id,
                   list_slice(toks, unnest(starts), unnest(starts) + {CHUNK_TOKENS} - 1) AS win,
                   generate_subscripts(starts, 1) AS idx
            FROM (
                SELECT doc_id, toks,
                       list_sort(list_distinct(list_append(
                           generate_series(1, greatest(1, len(toks) - {CHUNK_TOKENS} + 1), {CHUNK_STEP}),
                           greatest(1, len(toks) - {CHUNK_TOKENS} + 1)))) AS starts
                FROM toks_t WHERE len(toks) > 0))),
    tf AS (SELECT chunk_uid, token FROM chunk_toks GROUP BY chunk_uid, token),
    nchunks AS (SELECT count(DISTINCT chunk_uid) AS n FROM tf),
    df AS (
        SELECT token,
               count(*) AS cdf,
               count(*) FILTER ((chunk_uid // {CHUNKS_PER_DOC_CAP}) % {probe_doc_mod} = 0) AS pdf
        FROM tf, nchunks GROUP BY token, n HAVING count(*) <= {RETRIEVAL_MAX_DF} * n)
    SELECT sum(pdf * cdf)::BIGINT FROM df
    """).fetchone()[0]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2000,4000,8000,16000")
    ap.add_argument("--vocab", type=int, default=10_000)
    ap.add_argument("--doc-tokens", type=int, default=120)
    ap.add_argument("--probe-docs", type=int, default=16)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/zipf_retrieval")
    ap.add_argument("--out", default="ZIPF_RETRIEVAL_STUDY_r07.json")
    ap.add_argument(
        "--op",
        choices=("tfidf", "bm25"),
        default="tfidf",
        help="which sparse-retrieval core to measure (both share the "
        "inverted-index join shape; bm25 swaps the per-posting weight)",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from map_reduce_spark.functions.retrieval import _bm25_search, _tfidf_search
    from map_reduce_spark.session import get_spark

    search = _tfidf_search if args.op == "tfidf" else _bm25_search
    spark = get_spark()
    results = []
    for n in sizes:
        sf_dir = f"{args.workdir}/n{n}_v{args.vocab}_t{args.doc_tokens}"
        if not os.path.exists(f"{sf_dir}/documents.parquet"):
            make_corpus(sf_dir, n, args.vocab, args.doc_tokens)
        probe_mod = max(1, n // args.probe_docs)  # fixed probe-doc count
        mass = posting_mass(sf_dir, probe_mod)
        times = []
        rows = None
        for _ in range(args.runs):
            t0 = time.monotonic()
            rows = search(spark, sf_dir, probe_mod).collect()
            times.append(time.monotonic() - t0)
        rec = {
            "n_docs": n,
            "probe_doc_mod": probe_mod,
            "n_probe_docs": -(-n // probe_mod),
            "posting_mass": int(mass),
            "spark_sec": round(min(times), 3),
            "result_rows": len(rows),
        }
        # correctness cross-check of the study pipeline at the smallest
        # point (DuckDB twin is quadratic-ish in engine overhead at the
        # larger ones and isn't the object of measurement)
        if n == sizes[0]:
            dsec, drows = duckdb_twin_seconds(sf_dir, probe_mod, args.op)
            got = sorted((r.probe_uid, r.cand_uid, r.rank) for r in rows)
            want = sorted((r[0], r[1], r[3]) for r in drows)
            rec["duckdb_sec"] = round(dsec, 3)
            rec["matches_duckdb"] = got == want
        results.append(rec)
        print(json.dumps(rec))

    for prev, cur in zip(results, results[1:]):
        cur["time_ratio_vs_prev"] = round(cur["spark_sec"] / prev["spark_sec"], 2)
        cur["mass_ratio_vs_prev"] = round(cur["posting_mass"] / prev["posting_mass"], 2)
    out = {
        "study": "zipf_retrieval_fixed_vocab_fixed_probes",
        "op": args.op,
        "vocab": args.vocab,
        "zipf_s": ZIPF_S,
        "doc_tokens": args.doc_tokens,
        "points": results,
        "interpretation": (
            "fixed 10^4-token Zipf vocabulary, fixed probe count; "
            "linear-in-corpus cost shows as time_ratio ~2 per doubling "
            "(quadratic would be ~4); posting_mass is the join's "
            "intrinsic work metric the runtime should track"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
