"""RAKE keyword extraction over the documents corpus.

Rapid Automatic Keyword Extraction (Rose et al., 2010 — public
chapter in "Text Mining: Applications and Theory"): candidate
phrases are maximal runs of non-stopword tokens; each word scores
degree/frequency over the phrase graph (degree = summed length of
phrases containing the word, frequency = occurrence count); a phrase
scores the sum of its words' scores. The top phrases per document are
its keywords — the classic cheap keyword baseline a curation pipeline
runs before anything model-based.

Fidelity deviation (documented, ADVICE r7): the published algorithm
also breaks phrases at punctuation/sentence delimiters; this
implementation's tokenizer splits on ``[^a-z]+`` and keeps only the
surviving token positions, so a phrase can span a sentence boundary
("...the end. Great start..." yields the candidate "end great
start"). Both the Spark side and the oracle implement the SAME
convention (token index runs over the post-split array on both
engines — see the mirrored ``idx`` derivations), so the differential
gate is unaffected; the deviation trades a second delimiter pass for
one tokenize, which is the right trade for a cheap curation baseline.

Scale design (100 TB):
- Phrase segmentation is the gaps-and-islands idiom (posexplode with
  index, island id = idx - dense run position) — two windows on ONE
  (doc_id) partitioning, linear in tokens.
- Word stats (freq, degree) are decomposable aggregates over the
  exploded phrase-word frame, vocabulary-bounded output; they join
  back by word (broadcastable for real vocabularies, hash join at
  worst).
- Per-doc top-k is the rank-on-rounded-score window convention every
  retrieval op here uses.

Score arithmetic: degree and freq are exact integers; a word's score
degree/freq and the phrase sum are small-rational doubles, round(6)
per the house convention (ratios of bounded ints — both engines
compute the same few-term sums in document order via the sorted
aggregation below, and the oracle mirrors it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from map_reduce_spark.functions.text import STOPWORDS
from map_reduce_spark.operators.text_rel import doc_toks, tokens_col
from map_reduce_spark.plans.transient import ordered_result
from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_spread

RAKE_TOP_K = 5
RAKE_MAX_PHRASE = 4  # drop degenerate whole-sentence runs
# One flat stopword set across languages: RAKE's delimiter alphabet.
_RAKE_STOPS = sorted({w for ws in STOPWORDS.values() for w in ws})

_STOPS_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOPS)

_RAKE_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, tok, idx,
               tok IN ({_STOPS_SQL}) AS is_stop
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok,
                   generate_subscripts(
                       string_split_regex(lower(text), '[^a-z]+'), 1) AS idx
            FROM documents)
        WHERE length(tok) > 0
    ),
    islands AS (
        SELECT doc_id, tok, idx,
               idx - row_number() OVER (PARTITION BY doc_id, is_stop
                                        ORDER BY idx) AS island
        FROM toks WHERE NOT is_stop
    ),
    phrases AS (
        SELECT doc_id, island,
               string_agg(tok, ' ' ORDER BY idx) AS phrase,
               count(*) AS plen
        FROM islands GROUP BY doc_id, island
    ),
    kept AS (SELECT * FROM phrases WHERE plen <= {RAKE_MAX_PHRASE}),
    pw AS (
        SELECT doc_id, island, plen,
               unnest(string_split(phrase, ' ')) AS word
        FROM kept
    ),
    wordstats AS (
        SELECT word, count(*) AS freq, sum(plen) AS degree
        FROM pw GROUP BY word
    ),
    scored AS (
        SELECT p.doc_id, p.island,
               round(sum(ws.degree * 1.0 / ws.freq), 6) AS score
        FROM pw p JOIN wordstats ws USING (word)
        GROUP BY p.doc_id, p.island
    )
    SELECT k.doc_id, k.phrase, s.score,
           CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT doc_id, island, score,
               row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, island) AS rnk
        FROM scored) s
    JOIN kept k USING (doc_id, island)
    WHERE rnk <= {RAKE_TOP_K}
    ORDER BY doc_id, rank
"""


@register("doc_keywords_rake", oracle_sql=_RAKE_ORACLE)
def doc_keywords_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{5} RAKE keyword phrases per document with their
    degree/frequency scores. See module docstring for the algorithm
    and scale shape; phrase runs longer than {4} tokens are dropped
    (RAKE's stopword-poor-text degeneracy guard). Ties rank by island
    position (earlier phrase wins), engine-stable via round(6).
    """
    toks = doc_toks(spark, sf_dir).select(
        "doc_id", F.posexplode("toks").alias("idx0", "tok")
    ).select(
        "doc_id",
        (F.col("idx0") + 1).alias("idx"),  # 1-based like the oracle
        "tok",
        F.col("tok").isin(*_RAKE_STOPS).alias("is_stop"),
    )
    w_run = W.partitionBy("doc_id", "is_stop").orderBy("idx")
    islands = (
        toks.filter(~F.col("is_stop"))
        .withColumn("island", F.col("idx") - F.row_number().over(w_run))
    )
    phrases = islands.groupBy("doc_id", "island").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("idx", "tok"))
                ),
                lambda s: s["tok"],
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    kept = phrases.filter(F.col("plen") <= RAKE_MAX_PHRASE)
    pw = kept.select(
        "doc_id",
        "island",
        "plen",
        F.explode(F.split("phrase", " ")).alias("word"),
    )
    wordstats = pw.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree")
    )
    scored = (
        pw.join(wordstats, "word")
        .groupBy("doc_id", "island")
        .agg(
            F.round(
                F.sum(F.col("degree") * 1.0 / F.col("freq")), 6
            ).alias("score")
        )
    )
    w_rank = W.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("island")
    )
    ranked = scored.withColumn(
        "rank", F.row_number().over(w_rank).cast("long")
    ).filter(F.col("rank") <= RAKE_TOP_K)
    return (
        ranked.join(kept, ["doc_id", "island"])
        .select("doc_id", "phrase", "score", "rank")
        .transform(ordered_result, "doc_id", "rank")
    )
