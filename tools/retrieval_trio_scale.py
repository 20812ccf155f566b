"""Spark-only scale ladder for the retrieval trio after the r10
candidate-postings cap (RETRIEVAL_MAX_POSTINGS) — the measurement the
r9 sweep could not take because the uncapped degenerate-vocabulary
join ENOSPC'd the box at sf3 (SF3_REGISTRY_SPARK_r09.json).

One fresh session per scale point (cold index builds included, the
honest-rebuild convention); within the session the three queries run
in registry order, so bm25/rrf see the session-cached indexes exactly
as a registry sweep would. min-of-N wall clock per query.

Usage: python tools/retrieval_trio_scale.py SF_DIR LABEL [REPS]
Prints one JSON line; the caller aggregates ladder points into
RETRIEVAL_TRIO_SF_r10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, label = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from map_reduce_spark.plans.transient import release_transient
    from map_reduce_spark.registry import load_all

    reg = load_all()
    out: dict[str, object] = {"sf_dir": sf_dir, "label": label, "reps": reps}
    times: dict[str, float] = {}
    for name in (
        "rag_chunk_tfidf_search",
        "rag_bm25_search",
        "rag_rrf_fusion_search",
    ):
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            n = reg[name].builder(spark, sf_dir).count()
            dt = time.monotonic() - t0
            release_transient()
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        out.setdefault("rows", {})[name] = n  # type: ignore[union-attr]
        print(f"  {label} {name}: {best:.2f}s rows={n}", file=sys.stderr)
    out["sec"] = times
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
