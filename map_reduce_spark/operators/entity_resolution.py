"""End-to-end entity resolution (master-data-management workload).

``fuzzy_join_part_names`` emits similar-name PAIRS; real MDM resolves
them into ENTITIES: block -> score -> transitive closure -> one
canonical record per entity. This operator runs that whole pipeline
over the part catalog: names within edit distance 1 are the same
entity (transitively — A~B, B~C chains into {A,B,C}, the documented
ER chaining behavior), and each entity reports its canonical record
and member statistics.

Scale design (100 TB):
- Resolution runs on the ATTRIBUTE DOMAIN, not the records: distinct
  names collapse first (the name vocabulary is bounded by
  construction — adjective x noun here, brand/catalog vocabularies in
  practice — while records grow with the fact table), so the pair
  scoring and the closure touch a constant-size graph and records
  join back by name at the end.
- The all-pairs levenshtein on the bounded name domain is a
  deliberate choice AT THIS DOMAIN SIZE; for open-vocabulary
  attributes the q-gram blocking of ``fuzzy_join_part_names``
  (zero-miss certified) slots in front unchanged.
- The closure reuses the shared min-label fixpoint kernel
  (functions/dedup.py:_min_label_propagation — lineage-checkpointed
  rounds, edge-count-sized parallelism). Node ids are min-partkey
  per name, so labels are stable bigints and the entity id IS the
  canonical record's key.

Oracle: DuckDB computes the same closure with WITH RECURSIVE
transitive reachability over the identical edge predicate, then the
same canonical/statistics rollup — the hash match certifies blocking
(none needed), scoring, closure, and canonicalization together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.functions.dedup import _min_label_propagation
from map_reduce_spark.plans.transient import ordered_result
from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_table

ER_MAX_EDIT = 1

_ER_ORACLE = f"""
    WITH RECURSIVE names AS (
        SELECT p_name, min(p_partkey) AS nid, count(*) AS n_parts
        FROM part GROUP BY p_name
    ),
    edges AS (
        SELECT a.nid AS na, b.nid AS nb
        FROM names a JOIN names b
          ON a.nid <> b.nid
         AND levenshtein(a.p_name, b.p_name) <= {ER_MAX_EDIT}
    ),
    reach(nid, r) AS (
        SELECT nid, nid FROM names
        UNION
        SELECT e.nb, r.r FROM reach r JOIN edges e ON e.na = r.nid
    ),
    entities AS (
        SELECT nid, min(r) AS entity_id FROM reach GROUP BY nid
    ),
    members AS (
        SELECT e.entity_id, n.p_name, n.nid, n.n_parts
        FROM names n JOIN entities e ON n.nid = e.nid
    ),
    name_stats AS (
        SELECT entity_id,
               CAST(count(*) AS BIGINT) AS n_names,
               CAST(sum(n_parts) AS BIGINT) AS n_parts
        FROM members GROUP BY entity_id
    ),
    price_stats AS (
        SELECT m.entity_id,
               min(p.p_retailprice) AS min_price,
               max(p.p_retailprice) AS max_price
        FROM members m JOIN part p ON p.p_name = m.p_name
        GROUP BY m.entity_id
    )
    SELECT s.entity_id,
           (SELECT p_name FROM names WHERE nid = s.entity_id)
               AS canonical_name,
           s.n_names, s.n_parts, pr.min_price, pr.max_price
    FROM name_stats s JOIN price_stats pr ON s.entity_id = pr.entity_id
    ORDER BY s.entity_id
"""


@register("er_resolve_parts", oracle_sql=_ER_ORACLE)
def er_resolve_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolved part entities: names within edit distance
    {1} merge transitively; each entity reports its canonical name
    (the min-partkey member's), member-name count, record count, and
    price extrema. See the module docstring for the pipeline and its
    attribute-domain scale argument.

    DEFERRED: the closure is the shared fixpoint loop (bounded
    rounds over the name graph), so the builder returns a schema
    proxy per the uniform lazy contract.
    """
    from map_reduce_spark.plans.deferred import deferred

    schema = (
        "entity_id BIGINT NOT NULL, canonical_name STRING, "
        "n_names BIGINT NOT NULL, n_parts BIGINT NOT NULL, "
        "min_price DOUBLE, max_price DOUBLE"
    )

    def build() -> DataFrame:
        part = load_table(spark, sf_dir, "part")
        names = part.groupBy("p_name").agg(
            F.min("p_partkey").alias("nid"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        a = names.select(
            F.col("p_name").alias("name_a"), F.col("nid").alias("na")
        )
        b = names.select(
            F.col("p_name").alias("name_b"), F.col("nid").alias("nb")
        )
        pairs = a.join(
            b,
            (F.col("na") < F.col("nb"))
            & (
                F.levenshtein(F.col("name_a"), F.col("name_b"))
                <= ER_MAX_EDIT
            ),
        ).select("na", "nb")
        labels = _min_label_propagation(spark, pairs, "na", "nb")
        entities = names.join(
            labels, names.nid == labels.doc_id, "left"
        ).select(
            "p_name",
            "nid",
            "n_parts",
            F.coalesce("lbl", "nid").alias("entity_id"),
        )
        canon = entities.filter(
            F.col("nid") == F.col("entity_id")
        ).select(
            F.col("entity_id").alias("c_eid"),
            F.col("p_name").alias("canonical_name"),
        )
        stats = (
            entities.join(
                part.select("p_name", "p_retailprice"), "p_name"
            )
            .groupBy("entity_id")
            .agg(
                F.count_distinct("p_name").alias("n_names"),
                F.count(F.lit(1)).alias("n_parts"),
                F.min("p_retailprice").alias("min_price"),
                F.max("p_retailprice").alias("max_price"),
            )
        )
        return (
            stats.join(
                F.broadcast(canon),
                stats.entity_id == canon.c_eid,
            )
            .select(
                "entity_id",
                "canonical_name",
                "n_names",
                "n_parts",
                "min_price",
                "max_price",
            )
            .transform(ordered_result, "entity_id")
        )

    return deferred(spark, schema, build)
