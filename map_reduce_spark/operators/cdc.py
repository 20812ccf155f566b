"""Change-data-capture maintenance: MERGE / upsert semantics.

Warehouses continuously fold change batches (inserts, updates,
deletes) into large fact tables; ``MERGE INTO`` is the one relational
maintenance primitive the registry did not yet cover. The reference
engine (SURVEY.md §2.3) has no mutation surface at all — its jobs are
scan→map→reduce over immutable inputs (/root/reference/src/mr/
worker.go:87) — so this generalizes the same way the relational suite
does: the merged table is DECLARED as a join, never mutated in place.

Batch derivation follows ``dedup_incremental_batch``'s fixture
convention (functions/dedup.py): deterministic key-residue slices of
the existing table play the incoming change batch, so the query is
self-contained and exactly oracle-able.

Scale notes (100 TB target):
- The general MERGE shape is ONE full-outer shuffle join keyed on the
  merge key — both sides hash-partition on ``o_orderkey``, cost is a
  single co-partitioned pass; no driver-side state.
- Full-outer joins cannot broadcast, but when the change batch is
  small relative to the target (the common CDC regime — NOT this
  fixture's deliberate ~30 % slice), the plan rewrites to
  ``target LEFT ANTI changes  UNION ALL  upserted-changes`` where the
  anti and semi probes DO broadcast the batch, touching each target
  partition exactly once with no shuffle. Lakehouse MERGE engines
  (Delta/Iceberg) add partition pruning by the batch's touched-key
  range on top; with a date-partitioned target the same predicate
  would prune here too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_table

# Key-residue slices playing the change batch (mod 10 of o_orderkey):
# residue 3 -> UPDATE, residue 7 -> DELETE, residue 5 -> INSERT (as a
# fresh negated key that cannot collide with existing ones).
_UPD_RES, _DEL_RES, _INS_RES = 3, 7, 5

_MERGE_ORACLE = f"""
    WITH changes AS (
        SELECT o_orderkey AS c_key, 'U' AS op, o_custkey AS c_custkey,
               'U' AS c_status, o_totalprice AS c_totalprice,
               o_orderdate AS c_orderdate, '9-MERGED' AS c_priority
        FROM orders WHERE o_orderkey % 10 = {_UPD_RES}
        UNION ALL
        SELECT o_orderkey, 'D', NULL, NULL, NULL, NULL, NULL
        FROM orders WHERE o_orderkey % 10 = {_DEL_RES}
        UNION ALL
        SELECT -o_orderkey, 'I', o_custkey, 'N', o_totalprice,
               o_orderdate + INTERVAL 1 DAY, o_orderpriority
        FROM orders WHERE o_orderkey % 10 = {_INS_RES}
    )
    SELECT coalesce(t.o_orderkey, c.c_key) AS o_orderkey,
           CASE WHEN c.op = 'I' THEN c.c_custkey
                ELSE t.o_custkey END AS o_custkey,
           CASE WHEN c.op IN ('U', 'I') THEN c.c_status
                ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN c.op = 'I' THEN c.c_totalprice
                ELSE t.o_totalprice END AS o_totalprice,
           strftime(CASE WHEN c.op = 'I' THEN c.c_orderdate
                         ELSE t.o_orderdate END,
                    '%Y-%m-%d %H:%M:%S') AS o_orderdate,
           CASE WHEN c.op IN ('U', 'I') THEN c.c_priority
                ELSE t.o_orderpriority END AS o_orderpriority,
           CASE c.op WHEN 'U' THEN 'updated' WHEN 'I' THEN 'inserted'
                ELSE 'kept' END AS merge_action
    FROM orders t FULL OUTER JOIN changes c ON t.o_orderkey = c.c_key
    WHERE c.op IS NULL OR c.op <> 'D'
    ORDER BY o_orderkey
"""


@register("merge_orders_upsert", oracle_sql=_MERGE_ORACLE)
def merge_orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO orders: apply an update/delete/insert change batch
    in one pass, emitting the maintained table plus a ``merge_action``
    audit column (kept / updated / inserted; deletes vanish).

    Semantics match ANSI MERGE: WHEN MATCHED AND op='U' THEN UPDATE,
    WHEN MATCHED AND op='D' THEN DELETE, WHEN NOT MATCHED THEN INSERT.
    Every change column is copied or integer/interval-derived — no
    floating-point arithmetic — so the oracle comparison is exact.

    Plan: one full-outer sort-merge join on ``o_orderkey`` (see module
    docstring for the broadcast rewrite when the batch is small).
    """
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")

    def payload(op: str) -> DataFrame:
        base = orders
        if op == "U":
            rows = base.filter(k % 10 == _UPD_RES).select(
                k.alias("c_key"),
                F.lit("U").alias("op"),
                F.col("o_custkey").alias("c_custkey"),
                F.lit("U").alias("c_status"),
                F.col("o_totalprice").alias("c_totalprice"),
                F.col("o_orderdate").alias("c_orderdate"),
                F.lit("9-MERGED").alias("c_priority"),
            )
        elif op == "D":
            rows = base.filter(k % 10 == _DEL_RES).select(
                k.alias("c_key"),
                F.lit("D").alias("op"),
                F.lit(None).cast("bigint").alias("c_custkey"),
                F.lit(None).cast("string").alias("c_status"),
                F.lit(None).cast("double").alias("c_totalprice"),
                F.lit(None).cast("timestamp").alias("c_orderdate"),
                F.lit(None).cast("string").alias("c_priority"),
            )
        else:  # insert: fresh negated keys, shifted a day
            rows = base.filter(k % 10 == _INS_RES).select(
                (-k).alias("c_key"),
                F.lit("I").alias("op"),
                F.col("o_custkey").alias("c_custkey"),
                F.lit("N").alias("c_status"),
                F.col("o_totalprice").alias("c_totalprice"),
                (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias(
                    "c_orderdate"
                ),
                F.col("o_orderpriority").alias("c_priority"),
            )
        return rows

    changes = payload("U").unionByName(payload("D")).unionByName(payload("I"))
    t, c = orders.alias("t"), changes.alias("c")
    op = F.col("c.op")
    upserted = op.isin("U", "I")
    merged = t.join(c, F.col("t.o_orderkey") == F.col("c.c_key"), "full_outer")
    return (
        merged.filter(op.isNull() | (op != "D"))
        .select(
            F.coalesce(F.col("t.o_orderkey"), F.col("c.c_key")).alias(
                "o_orderkey"
            ),
            F.when(op == "I", F.col("c.c_custkey"))
            .otherwise(F.col("t.o_custkey"))
            .alias("o_custkey"),
            F.when(upserted, F.col("c.c_status"))
            .otherwise(F.col("t.o_orderstatus"))
            .alias("o_orderstatus"),
            F.when(op == "I", F.col("c.c_totalprice"))
            .otherwise(F.col("t.o_totalprice"))
            .alias("o_totalprice"),
            F.date_format(
                F.when(op == "I", F.col("c.c_orderdate")).otherwise(
                    F.col("t.o_orderdate")
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("o_orderdate"),
            F.when(upserted, F.col("c.c_priority"))
            .otherwise(F.col("t.o_orderpriority"))
            .alias("o_orderpriority"),
            F.when(op == "U", F.lit("updated"))
            .when(op == "I", F.lit("inserted"))
            .otherwise(F.lit("kept"))
            .alias("merge_action"),
        )
        .orderBy("o_orderkey")
    )


_IVM_ORACLE = f"""
    WITH changes AS (
        SELECT o_orderkey AS c_key, 'U' AS op, o_custkey AS c_custkey,
               o_totalprice AS c_totalprice, o_orderdate AS c_orderdate,
               '9-MERGED' AS c_priority
        FROM orders WHERE o_orderkey % 10 = {_UPD_RES}
        UNION ALL
        SELECT o_orderkey, 'D', NULL, NULL, NULL, NULL
        FROM orders WHERE o_orderkey % 10 = {_DEL_RES}
        UNION ALL
        SELECT -o_orderkey, 'I', o_custkey, o_totalprice,
               o_orderdate + INTERVAL 1 DAY, o_orderpriority
        FROM orders WHERE o_orderkey % 10 = {_INS_RES}
    ),
    merged AS (
        SELECT CASE WHEN c.op = 'I' THEN c.c_totalprice
                    ELSE t.o_totalprice END AS price,
               CASE WHEN c.op = 'I' THEN c.c_orderdate
                    ELSE t.o_orderdate END AS odate,
               CASE WHEN c.op IN ('U', 'I') THEN c.c_priority
                    ELSE t.o_orderpriority END AS priority
        FROM orders t FULL OUTER JOIN changes c ON t.o_orderkey = c.c_key
        WHERE c.op IS NULL OR c.op <> 'D'
    )
    SELECT strftime(date_trunc('month', odate), '%Y-%m') AS month,
           priority,
           count(*) AS n_orders,
           CAST(round(sum(CAST(price AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_price
    FROM merged
    GROUP BY 1, 2
    ORDER BY month, priority
"""


@register("ivm_orders_daily_totals", oracle_sql=_IVM_ORACLE)
def ivm_orders_daily_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-(month, priority) order
    totals view is MAINTAINED from the base aggregate plus a SIGNED
    delta aggregate of the change batch — never by rescanning the
    merged table. The oracle computes the view by full recompute over
    the merged result, so a hash match proves base ⊕ delta ==
    recompute, which is the IVM correctness contract (the
    materialized-view / DBSP delta rule for decomposable aggregates).

    Delta expansion per change class (same fixture batch as
    ``merge_orders_upsert``): UPDATE retracts (-1, -price) at the
    row's OLD group and asserts (+1, +price) at its NEW group (the
    priority rewrite moves it across groups); DELETE retracts;
    INSERT asserts at its (date + 1 day) group. Sums run in
    DECIMAL(18,4) so retract/assert arithmetic is exact — a double
    sum could differ from the recompute by an ulp and flip the hash.

    Scale: this is the pattern that makes a 100 TB serving view
    maintainable — per batch the work is O(|changes|) + a
    groups-sized outer join, instead of an O(|base|) rescan; count
    and decimal-sum are self-inverse under retraction, so no other
    state is needed (MIN/MAX would need the full per-group multiset —
    the known IVM non-decomposable caveat).
    """
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    month = lambda c: F.date_format(F.date_trunc("month", c), "yyyy-MM")  # noqa: E731
    price_dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731

    base_agg = orders.groupBy(
        month(F.col("o_orderdate")).alias("month"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(price_dec("o_totalprice")).alias("tp"),
    )

    # ONE scan for every delta class: residue predicates on
    # expressions don't push into the parquet scan, so a union of
    # per-class filters would read the fact table once per class. Each
    # changed row instead expands ARRAY-side into its signed
    # (month, priority, dn, dtp) contributions — updates into a
    # retract+assert pair, deletes into one retract, inserts into one
    # assert — and a single explode flattens them.
    def entry(sign: int, date_col, prio_col):
        return F.struct(
            month(date_col).alias("month"),
            prio_col.alias("priority"),
            F.lit(sign).cast("long").alias("dn"),
            (F.lit(sign) * price_dec("o_totalprice")).alias("dtp"),
        )

    res = k % 10
    contributions = (
        F.when(
            res == _UPD_RES,
            F.array(
                entry(-1, F.col("o_orderdate"), F.col("o_orderpriority")),
                entry(+1, F.col("o_orderdate"), F.lit("9-MERGED")),
            ),
        )
        .when(
            res == _DEL_RES,
            F.array(entry(-1, F.col("o_orderdate"), F.col("o_orderpriority"))),
        )
        .otherwise(
            F.array(
                entry(
                    +1,
                    F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"),
                    F.col("o_orderpriority"),
                )
            )
        )
    )
    deltas = (
        orders.filter(res.isin(_UPD_RES, _DEL_RES, _INS_RES))
        .select(F.explode(contributions).alias("e"))
        .select("e.month", "e.priority", "e.dn", "e.dtp")
    )
    delta_agg = deltas.groupBy("month", "priority").agg(
        F.sum("dn").alias("dn"), F.sum("dtp").alias("dtp")
    )
    maintained = (
        base_agg.join(delta_agg, ["month", "priority"], "full_outer")
        .select(
            "month",
            "priority",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias(
                "n_orders"
            ),
            (
                F.coalesce(F.col("tp"), F.lit(0).cast("decimal(18,4)"))
                + F.coalesce(F.col("dtp"), F.lit(0).cast("decimal(18,4)"))
            ).alias("tp_new"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return maintained.select(
        "month",
        "priority",
        "n_orders",
        F.round(F.col("tp_new"), 2).cast("double").alias("total_price"),
    ).orderBy("month", "priority")


# ---------------------------------------------------------------------------
# scd2_user_state_history — type-2 slowly-changing dimension build
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
    WITH ordered AS (
        SELECT user_id, event_type AS state, ts, event_id,
               lag(event_type) OVER w AS prev_state
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    transitions AS (
        SELECT user_id, state, ts, event_id
        FROM ordered
        WHERE prev_state IS NULL OR prev_state <> state
    )
    SELECT user_id,
           row_number() OVER w AS version,
           state,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM transitions
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, version
"""


@register("scd2_user_state_history", oracle_sql=_SCD2_ORACLE)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from a change log: the
    events stream is read as observations of each user's state
    (event_type); consecutive repeats collapse, and each retained
    transition becomes a versioned validity interval
    [valid_from, valid_to) with the open row flagged ``is_current``.

    This is the dimension-history layout every warehouse keeps for
    point-in-time joins — and the batch twin of the as-of join
    already registered (``asof_error_after_signup``): an as-of probe
    into this table is ``BETWEEN valid_from AND valid_to``.

    Plan: ONE hash partition on ``user_id`` serves both window layers
    (lag to find transitions, lead/row_number to close intervals) —
    Catalyst reuses the Exchange because the second window's
    partition key is a prefix of the first's sort order. No second
    shuffle, no driver state; scales as pure per-user window work.

    Determinism: the event order tiebreaks on ``event_id`` (unique),
    so the transition set is total-order stable; timestamps render to
    seconds (the fixture's granularity) for a text-exact compare.
    """
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w_scan = W.partitionBy("user_id").orderBy("ts", "event_id")
    transitions = (
        events.select("user_id", F.col("event_type").alias("state"), "ts",
                      "event_id")
        .withColumn("prev_state", F.lag("state").over(w_scan))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("state"))
        )
    )
    # (ts, event_id) tiebreak (r9): with a bare ts order, two state
    # transitions of one user at the same timestamp would make version
    # numbering and interval bounds legally nondeterministic in BOTH
    # engines; the shared total order pins them (same fix as
    # events_peak_concurrency's sid sum).
    w_ver = W.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (
        transitions.select(
            "user_id",
            F.row_number().over(w_ver).alias("version"),
            "state",
            F.date_format("ts", fmt).alias("valid_from"),
            F.date_format(F.lead("ts").over(w_ver), fmt).alias("valid_to"),
            F.lead("ts").over(w_ver).isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


# ---------------------------------------------------------------------------
# scd2_point_in_time_join — PIT probe into the type-2 history
# ---------------------------------------------------------------------------

_PIT_ORACLE = """
    WITH ordered AS (
        SELECT user_id, event_type AS state, ts, event_id,
               lag(event_type) OVER w AS prev_state
        FROM events
        WHERE event_type <> 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    transitions AS (
        SELECT user_id, state, ts, event_id FROM ordered
        WHERE prev_state IS NULL OR prev_state <> state
    ),
    hist AS (
        SELECT user_id, state, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM transitions
    ),
    probes AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT h.state AS state_at_purchase,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(round(sum(CAST(p.value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_value
    FROM probes p
    JOIN hist h
      ON p.user_id = h.user_id
     AND p.ts >= h.valid_from
     AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    GROUP BY h.state
    ORDER BY state_at_purchase
"""


@register("scd2_point_in_time_join", oracle_sql=_PIT_ORACLE)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase probes the SCD2 state
    history (``scd2_user_state_history``'s intervals) for the state
    that was CURRENT at the purchase instant — the dimension lookup
    every temporal warehouse does against a type-2 table, and the
    batch analogue of a feature-store PIT read. Purchases land in
    their own interval (the closed-open [valid_from, valid_to) rule
    makes the probe's anchoring transition win), so the result is the
    purchase count and decimal-exact value by concurrent state.

    Plan: the history build and the probe share ONE user_id hash
    partitioning — the interval predicate evaluates inside the
    co-partitioned join, never as a cross product; the result is
    |states| rows. At 100 TB the history side would be the already-
    materialized SCD2 table bucketed by the key, making the PIT read
    a co-located join plus an interval filter.
    """
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w_scan = W.partitionBy("user_id").orderBy("ts", "event_id")
    transitions = (
        events.filter(F.col("event_type") != "purchase")
        .select("user_id", F.col("event_type").alias("state"), "ts",
                "event_id")
        .withColumn("prev_state", F.lag("state").over(w_scan))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("state"))
        )
    )
    # (ts, event_id) tiebreak (r9): with a bare ts order, two state
    # transitions of one user at the same timestamp would make version
    # numbering and interval bounds legally nondeterministic in BOTH
    # engines; the shared total order pins them (same fix as
    # events_peak_concurrency's sid sum).
    w_ver = W.partitionBy("user_id").orderBy("ts", "event_id")
    hist = transitions.select(
        F.col("user_id").alias("h_user"),
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w_ver).alias("valid_to"),
    )
    probes = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = probes.join(
        hist,
        (F.col("user_id") == F.col("h_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return (
        joined.groupBy(F.col("state").alias("state_at_purchase"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("state_at_purchase")
    )
