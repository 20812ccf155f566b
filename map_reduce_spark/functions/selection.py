"""DSIR-style importance weighting for training-data selection.

Data Selection via Importance Resampling (Xie et al., 2023 — public
NeurIPS paper): score every raw document by how much more likely its
hashed n-gram features are under a TARGET distribution than under the
RAW distribution, then keep the top-weighted documents. This is the
standard pretraining-corpus curation move when a small high-quality
target exists; here the target is the fixture's English slice and the
features are hashed unigrams.

Math: for feature buckets b with add-one-smoothed unigram LMs
p_t (target) and p_r (raw), a document's log importance weight is
    log w(d) = sum_b  c_b(d) * ( ln p_t(b) - ln p_r(b) )
with c_b(d) the document's token count in bucket b.

Scale design (100 TB):
- The corpus-sized work is exactly ONE tokenize scan feeding two
  decomposable aggregates: per-(doc, bucket) counts (map-side
  combinable) and global per-bucket counts. No second pass.
- Both LMs live in a bucket table bounded by NB (=4096) rows —
  broadcast to the per-doc join regardless of corpus size. That
  boundedness is WHY DSIR hashes features instead of keying raw
  vocabulary.
- Selection is a top-k: TakeOrderedAndProject (per-partition heads,
  k-row merge), never a global sort.
- Hash buckets use the repo's cross-engine md5 idiom (same bucket ids
  in Spark and DuckDB), so the whole pipeline is oracle-checkable;
  per-doc double sums follow the proven round(6) logprob convention
  (functions/text.py doc_unigram_logprob).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from map_reduce_spark.operators.text_rel import doc_toks, tokens_col
from map_reduce_spark.plans.transient import transient_persist
from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_spread, load_table

NB = 4096  # hashed-feature buckets; bounds the LM tables by construction
TARGET_LANG = "en"
SELECT_K = 100

_DSIR_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
        FROM documents
    ),
    feat AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % {NB} AS b
        FROM toks WHERE length(tok) > 0
    ),
    raw_lm AS (SELECT b, count(*) AS cr FROM feat GROUP BY b),
    tgt_lm AS (
        SELECT b, count(*) AS ct FROM feat
        WHERE lang = '{TARGET_LANG}' GROUP BY b
    ),
    tots AS (
        SELECT count(*) AS nr,
               sum(CASE WHEN lang = '{TARGET_LANG}' THEN 1 ELSE 0 END) AS nt
        FROM feat
    ),
    lr AS (
        SELECT raw_lm.b,
               ln((coalesce(ct, 0) + 1.0) / (nt + {NB}.0))
                 - ln((cr + 1.0) / (nr + {NB}.0)) AS logratio
        FROM raw_lm LEFT JOIN tgt_lm ON raw_lm.b = tgt_lm.b
        CROSS JOIN tots
    ),
    docb AS (SELECT doc_id, b, count(*) AS c FROM feat GROUP BY doc_id, b),
    weights AS (
        SELECT docb.doc_id, round(sum(c * logratio), 6) AS log_weight
        FROM docb JOIN lr ON docb.b = lr.b
        GROUP BY docb.doc_id
    )
    SELECT d.doc_id, d.lang, w.log_weight,
           CAST(row_number() OVER (ORDER BY w.log_weight DESC, d.doc_id)
                AS BIGINT) AS rank
    FROM weights w JOIN documents d ON w.doc_id = d.doc_id
    ORDER BY w.log_weight DESC, d.doc_id
    LIMIT {SELECT_K}
"""


def _bucket(tok) -> F.Column:
    """Cross-engine feature hash: first 8 md5 hex digits -> bigint
    -> mod NB (matches the oracle's ('0x'||substr(md5,1,8))::BIGINT)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % NB
    )


@register("doc_dsir_select", oracle_sql=_DSIR_ORACLE)
def doc_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K documents by DSIR log importance weight (hashed-unigram
    features, English slice as the target distribution).

    Pipeline: tokenize once -> hashed buckets -> (a) per-(doc,bucket)
    counts, (b) bucket LMs for target and raw -> broadcast the
    NB-bounded log-ratio table into the per-doc weighted sum ->
    TakeOrderedAndProject top-K. See module docstring for the scale
    argument; weights round(6) per the logprob convention.
    """
    # load_spread, not load_table: the tokenize+md5 scan is the
    # corpus-sized work, and a single-file parquet corpus arrives as
    # 1-2 input splits — which serialized the whole feature pass onto
    # 2 of 32 cores (r9 profile: 8.4 s -> 2.2 s at sf1 from this one
    # change, 4.3x -> ~1.1x DuckDB). On a many-file cluster layout
    # the spread is a near-no-op.
    feat = (
        doc_toks(spark, sf_dir)
        .select("doc_id", "lang", F.explode("toks").alias("tok"))
        .select("doc_id", "lang", _bucket(F.col("tok")).alias("b"))
    )
    # One shuffle keyed (doc_id, b); every LM aggregate below derives
    # from this frame. Persist it: raw LM, target LM, totals, AND the
    # per-doc weighted sum all consume docb — without the persist the
    # plan is a 4-way diamond re-running tokenize+aggregate per arm
    # (measured 8.0 s -> 1.66 s at sf1, 4.9x -> 1.06x DuckDB). persist() is lazy,
    # so the builder contract holds; the frame is (doc, bucket)-grain,
    # far smaller than the token stream it replaces.
    docb = transient_persist(
        feat.groupBy("doc_id", "lang", "b").agg(F.count(F.lit(1)).alias("c"))
    )
    raw_lm = docb.groupBy("b").agg(F.sum("c").alias("cr"))
    tgt_lm = (
        docb.filter(F.col("lang") == TARGET_LANG)
        .groupBy("b")
        .agg(F.sum("c").alias("ct"))
    )
    tots = docb.agg(
        F.sum("c").alias("nr"),
        F.sum(F.when(F.col("lang") == TARGET_LANG, F.col("c"))).alias("nt"),
    )
    lr = (
        raw_lm.join(tgt_lm, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            (
                F.log((F.coalesce("ct", F.lit(0)) + 1.0) / (F.col("nt") + NB))
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + NB))
            ).alias("logratio"),
        )
    )
    weights = (
        docb.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("logratio")), 6).alias(
            "log_weight"
        ))
    )
    ranked = (
        weights.join(doc_toks(spark, sf_dir).select("doc_id", "lang"), "doc_id")
        .orderBy(F.desc("log_weight"), F.asc("doc_id"))
        .limit(SELECT_K)
    )
    w_rank = W.orderBy(F.desc("log_weight"), F.asc("doc_id"))
    return ranked.select(
        "doc_id",
        "lang",
        "log_weight",
        F.row_number().over(w_rank).cast("long").alias("rank"),
    ).orderBy("rank")
