"""map_reduce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference MapReduce engine
(naveen19991124/Map-Reduce, surveyed in SURVEY.md) as an idiomatic
PySpark DataFrame/SQL engine, plus the relational / streaming /
LLM-data-pipeline surface the test fixtures exercise.

Layout:
- ``session``    — SparkSession factory with pinned, scale-aware configs
- ``registry``   — central query registry (name -> builder + oracle SQL)
- ``sources``    — table loaders / schemas for the parquet fixtures
- ``operators``  — relational query library (joins, aggs, windows, ...)
- ``functions``  — text analysis, dedup, similarity-search operators
- ``compat``     — faithful MapReduce job API (reference parity layer)
- ``streaming``  — Structured Streaming slice over the events table
- ``plans``      — plan-inspection helpers (pushdown/broadcast asserts)
"""

__version__ = "0.1.0"
