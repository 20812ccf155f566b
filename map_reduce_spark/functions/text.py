"""Text-analysis operators for a training-data pipeline, over the
``documents`` table: language-ID, quality scoring, token statistics,
document fingerprinting.

These generalize the reference's text apps (wc/indexer,
/root/reference/src/mrapps/wc.go, indexer.go) to the operations an
LLM-data curation pipeline runs at 100 TB. Everything is built-in
``pyspark.sql.functions`` expressions (whole-stage codegen, zero
Python UDFs), so each query is a scan → project → (optional agg)
with full pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.operators.text_rel import tokens_col
from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_spread, load_table

# Tiny per-language stopword lists for the n-gram-free heuristic
# language identifier. Deliberately small + deterministic — the point
# is the *operator shape* (vectorized membership counting + argmax),
# not linguistic accuracy.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # tie-break priority


def _hits(lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(F.col("toks"), lambda t: t.isin(*words)))


def _sql_hits(lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(toks, t -> t IN ({inlist})))"


def _sql_tokens_cte() -> str:
    return """
    WITH toks_t AS (
        SELECT *, list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              t -> length(t) > 0) AS toks
        FROM documents)
    """


@register(
    "doc_langid",
    oracle_sql=_sql_tokens_cte()
    + f"""
    SELECT doc_id,
           CASE
             WHEN en_hits = 0 AND es_hits = 0 AND de_hits = 0 AND fr_hits = 0 THEN 'und'
             WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
             WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
             WHEN de_hits >= fr_hits THEN 'de'
             ELSE 'fr'
           END AS pred_lang,
           en_hits, es_hits, de_hits, fr_hits
    FROM (
        SELECT doc_id,
               {_sql_hits('en')} AS en_hits,
               {_sql_hits('es')} AS es_hits,
               {_sql_hits('de')} AS de_hits,
               {_sql_hits('fr')} AS fr_hits
        FROM toks_t)
    ORDER BY doc_id
    """,
)
def doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-hit counting + deterministic argmax.

    Scale: pure narrow transformation (no shuffle at all); the CASE
    chain encodes a fixed tie-break order so output is reproducible.
    """
    docs = load_spread(spark, sf_dir, "documents").withColumn("toks", tokens_col())
    hits = {lang: _hits(lang).alias(f"{lang}_hits") for lang in LANG_ORDER}
    scored = docs.select("doc_id", *hits.values())
    c = {lang: F.col(f"{lang}_hits") for lang in LANG_ORDER}
    pred = (
        F.when((c["en"] == 0) & (c["es"] == 0) & (c["de"] == 0) & (c["fr"] == 0), "und")
        .when((c["en"] >= c["es"]) & (c["en"] >= c["de"]) & (c["en"] >= c["fr"]), "en")
        .when((c["es"] >= c["de"]) & (c["es"] >= c["fr"]), "es")
        .when(c["de"] >= c["fr"], "de")
        .otherwise("fr")
    )
    return scored.select(
        "doc_id", pred.alias("pred_lang"), "en_hits", "es_hits", "de_hits", "fr_hits"
    ).orderBy("doc_id")


@register(
    "doc_token_stats",
    oracle_sql=_sql_tokens_cte()
    + """
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_unique_tokens,
           length(text) AS n_chars_actual,
           round(CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE list_sum(list_transform(toks, t -> length(t))) * 1.0 / len(toks)
                 END, 4) AS avg_token_len,
           round(CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE len(list_distinct(toks)) * 1.0 / len(toks)
                 END, 4) AS type_token_ratio
    FROM toks_t
    ORDER BY doc_id
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (count, vocabulary, TTR).

    Whitespace/letter tokenization + array aggregates — all codegen'd
    array expressions, no shuffle.
    """
    docs = load_spread(spark, sf_dir, "documents").withColumn("toks", tokens_col())
    n_tokens = F.size("toks")
    n_unique = F.size(F.array_distinct("toks"))
    total_len = F.aggregate(
        F.col("toks"), F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.round(
            F.when(n_tokens == 0, F.lit(0.0)).otherwise(
                total_len * F.lit(1.0) / n_tokens
            ),
            4,
        ).alias("avg_token_len"),
        F.round(
            F.when(n_tokens == 0, F.lit(0.0)).otherwise(
                n_unique * F.lit(1.0) / n_tokens
            ),
            4,
        ).alias("type_token_ratio"),
    ).orderBy("doc_id")


@register(
    "doc_quality_score",
    oracle_sql=_sql_tokens_cte()
    + f"""
    SELECT doc_id,
           n_tokens,
           stop_hits,
           round(stop_ratio, 4) AS stop_ratio,
           CASE WHEN n_tokens >= 20 AND stop_ratio >= 0.05 THEN 'keep'
                WHEN n_tokens >= 5 THEN 'review'
                ELSE 'drop' END AS quality_bucket
    FROM (
        SELECT doc_id,
               len(toks) AS n_tokens,
               {_sql_hits('en')} AS stop_hits,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE {_sql_hits('en')} * 1.0 / len(toks) END AS stop_ratio
        FROM toks_t)
    ORDER BY doc_id
    """,
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length + stopword-density gates -> keep/review/drop.

    The standard cheap pre-filter in a data-curation pipeline; runs as
    a narrow projection so it can sit directly on the ingest scan.
    """
    docs = load_spread(spark, sf_dir, "documents").withColumn("toks", tokens_col())
    n_tokens = F.size("toks")
    stop_hits = _hits("en")
    stop_ratio = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        stop_hits * F.lit(1.0) / n_tokens
    )
    bucket = (
        F.when((n_tokens >= 20) & (stop_ratio >= 0.05), "keep")
        .when(n_tokens >= 5, "review")
        .otherwise("drop")
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_hits.alias("stop_hits"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        bucket.alias("quality_bucket"),
    ).orderBy("doc_id")


@register(
    "doc_fingerprint",
    oracle_sql="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_len
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized lowercase text.

    The exact-dedup key generator — deterministic across engines and
    runs, usable as a shuffle/bucketing key at any scale.
    """
    docs = load_spread(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    ).orderBy("doc_id")


@register(
    "doc_stats_by_lang_source",
    oracle_sql="""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 4) AS avg_chars,
           min(doc_id) AS first_doc
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def doc_stats_by_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: per (lang, source) document stats."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang", "source")
    )
