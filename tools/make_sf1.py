"""Generate an sf1-scale dataset by replicating /root/testdata/sf0.1
ten times with disjoint key spaces — the scale-up study data for the
bench amortization claim in BASELINE.md.

Design (why not a naive 10x UNION ALL):
- Relational tables get per-replica KEY OFFSETS (orderkey/custkey/
  partkey/suppkey/event_id/user_id/doc_id/vec_id), so key cardinality
  grows 10x like a real TPC-H scale-up — group counts, join fan-outs,
  and shuffle key spaces scale honestly. region/nation stay fixed
  (true dims).
- documents get a deterministic per-replica TOKEN MUTATION (~40% of
  token types per replica get a letter suffix): within-replica
  similarity structure (planted near-dups) is preserved EXACTLY,
  while cross-replica trigram Jaccard drops to ~0.1 — far below the
  0.6 dedup threshold — so dup clusters don't artificially inflate
  10x (which would make pair counts quadratic in replica count, a
  pathology real corpora don't have).
- embeddings replicas >= 1 are freshly seeded random vectors (same
  label marginals), preserving the near-random-corpus structure
  instead of planting 10-way exact-dup clusters.
- events.ts is written as epoch-NANOSECOND BIGINT — the engine's
  loader normalizes int64-nanos (the fixture's TIMESTAMP(NANOS)
  physical type reads the same way under nanosAsLong), so the sf1
  table exercises the identical read path.

Usage: python tools/make_sf1.py [--out /tmp/sf1] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import zlib

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# (table, [key columns to offset by replica * stride])
OFFSET_KEYS = {
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
COPY_TABLES = ["region", "nation"]
# One stride for every key domain: larger than any max key in sf0.1.
STRIDE = 10_000_000


def scale_relational(con: duckdb.DuckDBPyConnection, out: str, replicas: int) -> None:
    for t in COPY_TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, keys in OFFSET_KEYS.items():
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        parts = []
        for i in range(replicas):
            sel = ", ".join(
                (
                    f"{c} + {i * STRIDE} AS {c}"
                    if c in keys
                    else (f"epoch_ns(ts) AS ts" if t == "events" and c == "ts" else c)
                )
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{SRC}/{t}.parquet'")
        union = " UNION ALL ".join(parts)
        con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


def mutate_text(text: str, replica: int) -> str:
    """Suffix ~40% of token TYPES with a replica-specific letter pair.

    Deterministic per (token, replica); identical tokens mutate
    identically, so within-replica Jaccard structure is unchanged
    while cross-replica shingle overlap collapses.
    """
    if replica == 0:
        return text
    # Replicas 1..25 keep the historical one-letter suffix (sf1 outputs
    # unchanged); >=26 get a second letter so suffixes never collide —
    # a wrap at 26 would plant exact cross-replica duplicate pairs and
    # quadratically inflate dedup pair counts at sf>=2.6.
    suffix = "q" + chr(ord("a") + (replica % 26))
    if replica >= 26:
        suffix += chr(ord("a") + (replica // 26))

    def mutate(w: str) -> str:
        # crc32, not hash(): stable across processes (PYTHONHASHSEED).
        return w + suffix if zlib.crc32(w.encode()) % 5 < 2 else w

    out = []
    word = []
    for ch in text:
        if ch.isalpha():
            word.append(ch)
        else:
            if word:
                out.append(mutate("".join(word)))
                word = []
            out.append(ch)
    if word:
        out.append(mutate("".join(word)))
    return "".join(out)


def scale_documents(con: duckdb.DuckDBPyConnection, out: str, replicas: int) -> None:
    src = con.execute(f"SELECT * FROM '{SRC}/documents.parquet'").df()
    frames = []
    for i in range(replicas):
        df = src.copy()
        df["doc_id"] = df["doc_id"] + i * STRIDE
        if i:
            df["text"] = [mutate_text(t, i) for t in src["text"]]
            df["n_chars"] = df["text"].str.len().astype("int64")
        frames.append(df)
    import pandas as pd

    all_docs = pd.concat(frames, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(all_docs, preserve_index=False), f"{out}/documents.parquet")
    print(f"documents: {len(all_docs)} rows")


def scale_embeddings(out: str, replicas: int) -> None:
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = tbl.column("vec_id").to_numpy()
    label = tbl.column("label").to_numpy()
    emb = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = emb.shape
    ids, labels, vecs = [], [], []
    for i in range(replicas):
        ids.append(vec_id + i * STRIDE)
        labels.append(label)
        if i == 0:
            vecs.append(emb)
        else:
            rng = np.random.default_rng(1000 + i)
            vecs.append(rng.normal(0.0, 1.0, size=(n, dim)).astype(np.float32))
    out_tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in np.concatenate(vecs)], type=pa.list_(pa.float32())
            ),
            "label": pa.array(np.concatenate(labels), type=pa.int32()),
        }
    )
    pq.write_table(out_tbl, f"{out}/embeddings.parquet")
    print(f"embeddings: {out_tbl.num_rows} rows")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    scale_relational(con, args.out, args.replicas)
    scale_documents(con, args.out, args.replicas)
    scale_embeddings(args.out, args.replicas)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
