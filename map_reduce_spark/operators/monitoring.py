"""Operational-analytics operators: drift detection, ABC analysis,
rolling actives.

Three dashboard/monitoring classics over the fixture tables:

- ``events_cusum_drift`` — one-sided CUSUM drift detection per event
  type. The textbook recursion S_t = max(0, S_{t-1} + (x_t - k)) is
  sequential, but it has a closed form the engine can distribute:
      S_t = P_t - min(P_0..P_t),   P_t = prefix-sum of (x - k)
  so CUSUM is exactly two window passes (running sum + running min)
  over the daily series — no recursion, no UDF, no driver loop.
- ``orders_abc_classes`` — ABC / Pareto revenue classification. The
  global revenue-ordered cumulative share would serialize into one
  partition, so customers aggregate to a FIXED revenue-bucket grain
  first; the cumulative share runs over the bounded bucket table
  (the same bounded-prefix trick as part_skyline_pareto), and class
  boundaries are defined AT bucket grain — deterministic, oracle-
  expressible, and scale-honest.
- ``events_rolling_7d_actives`` — trailing-7-day distinct active
  users per day (the canonical WAU-style metric). Exact sliding
  distinct is not frame-expressible, so the plan materializes the
  (day, user) distinct grid once and fans each row out to the <= 7
  calendar days it supports via sequence+explode — a bounded 7x
  row expansion feeding one count-distinct aggregate; no self-join,
  no window over raw events.

Scale notes: CUSUM's windows partition by event_type over a
calendar-bounded series (same boundedness argument as
events_gap_fill); ABC's only full-order structure is the ~1000-row
bucket table; rolling-actives' expansion factor is the window length
(7), constant in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from map_reduce_spark.plans.transient import ordered_result, transient_persist
from map_reduce_spark.registry import register
from map_reduce_spark.sources import load_table

CUSUM_SLACK = 0.5  # k = mean + slack * stddev (allowance)
CUSUM_H = 3.0  # alarm at h = H * stddev

_CUSUM_ORACLE = f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               count(*) AS n FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               CAST(round(avg(n * 1.0) + {CUSUM_SLACK} * stddev_samp(n * 1.0), 6)
                    AS DECIMAL(18,6)) AS k6,
               CAST(round({CUSUM_H} * stddev_samp(n * 1.0), 6)
                    AS DECIMAL(18,6)) AS h6
        FROM daily GROUP BY event_type
    ),
    series AS (
        SELECT d.event_type, d.day, d.n, s.h6,
               sum(CAST(d.n AS DECIMAL(18,6)) - s.k6) OVER w AS p
        FROM daily d JOIN stats s USING (event_type)
        WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
           round(CAST(p - least(min(p) OVER w2, CAST(0 AS DECIMAL(18,6)))
                      AS DOUBLE), 6) AS cusum,
           p - least(min(p) OVER w2, CAST(0 AS DECIMAL(18,6))) > h6
               AS alarm
    FROM series
    WINDOW w2 AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY event_type, day
"""


@register("events_cusum_drift", oracle_sql=_CUSUM_ORACLE)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift statistic per (event_type, day), with an
    alarm flag at h = 3 sigma. Uses the prefix-sum/running-min
    closed form (module docstring) so the sequential recursion
    becomes two ordered-frame windows — running frames evaluate
    incrementally in order on both engines, so the float stream is
    addition-order identical and the round(6) outputs match exactly.

    k (allowance) = mean + 0.5 sigma of the type's own daily series,
    rounded ONCE to 6dp and cast to DECIMAL(18,6): every prefix sum,
    running min, and threshold compare then runs in exact decimal
    arithmetic, immune to window-aggregate addition order (DuckDB's
    segment-tree frames reorder float sums — a 1-ulp boundary flip
    the first float version of this oracle actually hit). The min(P)
    clamps at 0 because S_0 starts at zero — the standard CUSUM
    boundary.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    dec = "decimal(18,6)"
    stats = daily.groupBy("event_type").agg(
        F.round(
            F.avg(F.col("n") * 1.0)
            + CUSUM_SLACK * F.stddev_samp(F.col("n") * 1.0),
            6,
        )
        .cast(dec)
        .alias("k6"),
        F.round(CUSUM_H * F.stddev_samp(F.col("n") * 1.0), 6)
        .cast(dec)
        .alias("h6"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    series = daily.join(F.broadcast(stats), "event_type").withColumn(
        "p", F.sum(F.col("n").cast(dec) - F.col("k6")).over(w)
    )
    cusum_dec = F.col("p") - F.least(
        F.min("p").over(w), F.lit(0).cast(dec)
    )
    return series.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.round(cusum_dec.cast("double"), 6).alias("cusum"),
        (cusum_dec > F.col("h6")).alias("alarm"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# orders_abc_classes — Pareto / ABC revenue classification
# ---------------------------------------------------------------------------

ABC_BUCKET_CENTS = 100_000  # $1000 customer-revenue buckets
ABC_A, ABC_B = 0.5, 0.8  # cumulative-share boundaries

_ABC_ORACLE = f"""
    WITH rev AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    bucketed AS (
        SELECT o_custkey, cents, cents // {ABC_BUCKET_CENTS} AS bucket
        FROM rev
    ),
    buckets AS (
        SELECT bucket, sum(cents) AS bcents, count(*) AS bn
        FROM bucketed GROUP BY bucket
    ),
    ranked AS (
        SELECT bucket,
               sum(bcents) OVER (ORDER BY bucket DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   * 1.0 / sum(bcents) OVER () AS cum_share
        FROM buckets
    ),
    classed AS (
        SELECT b.o_custkey, b.cents,
               CASE WHEN r.cum_share <= {ABC_A} THEN 'A'
                    WHEN r.cum_share <= {ABC_B} THEN 'B'
                    ELSE 'C' END AS abc
        FROM bucketed b JOIN ranked r USING (bucket)
    )
    SELECT abc, count(*) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           round(sum(cents) * 1.0 / (SELECT sum(cents) FROM rev), 6)
               AS revenue_share
    FROM classed GROUP BY abc ORDER BY abc
"""


@register("orders_abc_classes", oracle_sql=_ABC_ORACLE)
def orders_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of customers by lifetime revenue:
    class A = the top buckets holding the first 50% of revenue,
    B = next 30%, C = the tail, with boundaries defined at a FIXED
    $1000 revenue-bucket grain so the cumulative share runs over a
    bounded bucket table instead of a global customer sort (the
    skyline's bounded-prefix trick). Revenue in exact cents.
    """
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    bucketed = rev.withColumn(
        "bucket", (F.col("cents") / ABC_BUCKET_CENTS).cast("long")
    )
    buckets = bucketed.groupBy("bucket").agg(F.sum("cents").alias("bcents"))
    w_desc = W.orderBy(F.desc("bucket")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.partitionBy()
    ranked = buckets.select(
        "bucket",
        (
            F.sum("bcents").over(w_desc) * 1.0
            / F.sum("bcents").over(w_all)
        ).alias("cum_share"),
    )
    classed = bucketed.join(F.broadcast(ranked), "bucket").select(
        "o_custkey",
        "cents",
        F.when(F.col("cum_share") <= ABC_A, "A")
        .when(F.col("cum_share") <= ABC_B, "B")
        .otherwise("C")
        .alias("abc"),
    )
    total = rev.agg(F.sum("cents").alias("total"))
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "abc",
            "n_customers",
            "revenue_cents",
            F.round(
                F.col("revenue_cents") * 1.0 / F.col("total"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc")
    )


# ---------------------------------------------------------------------------
# events_rolling_7d_actives — trailing-window distinct users
# ---------------------------------------------------------------------------

ROLLING_DAYS = 7

_ROLLING_ORACLE = f"""
    WITH du AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id
        FROM events
    ),
    fanout AS (
        SELECT unnest(generate_series(day,
                   day + INTERVAL {ROLLING_DAYS - 1} DAY,
                   INTERVAL 1 DAY)) AS target_day,
               user_id
        FROM du
    ),
    bounds AS (SELECT min(date_trunc('day', ts)) AS lo,
                      max(date_trunc('day', ts)) AS hi FROM events)
    SELECT strftime(target_day, '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS active_users_7d
    FROM fanout, bounds
    WHERE target_day BETWEEN lo AND hi
    GROUP BY target_day
    ORDER BY target_day
"""


@register("events_rolling_7d_actives", oracle_sql=_ROLLING_ORACLE)
def events_rolling_7d_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day, via an exact
    per-user INTERVAL SWEEP instead of the textbook 7x fanout +
    count-distinct (rewritten r8 — the fanout form was the r7
    verdict's third `weak` entry at 2.63x DuckDB, sf3).

    Identity: user u is active in the trailing window of day d iff u
    has an event in [d-6, d] — i.e. iff d falls in the union of
    [day, day+6] coverage intervals over u's active days. So per
    user: merge active days whose gaps are <= 6 into coverage runs
    (gaps-and-islands, one window), each run [s, e] covers target
    days [s, e+6]; a run contributes +1 at s and -1 at min(e+6, hi)+1
    (end clipped to the observed range, honest partial windows); the
    per-day active count is the running sum of day-deltas over the
    bounded calendar — the ABC/skyline bounded-prefix trick.

    Why this scales where the fanout didn't: the fanout's cost was a
    7x expansion of the (day, user) frame into a count-distinct
    (itself a second full dedup exchange at (day, user) grain). The
    sweep touches the (day, user) frame twice at 1x grain — one
    distinct, one user-keyed window whose downstream aggregate reuses
    the window's partitioning (grouping keys superset) — and
    everything after the run merge is calendar-bounded. Counts are
    exact integers; no approximation.
    """
    events = load_table(spark, sf_dir, "events")
    du = events.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    bounds = events.agg(
        F.to_date(F.min(F.date_trunc("day", "ts"))).alias("lo"),
        F.to_date(F.max(F.date_trunc("day", "ts"))).alias("hi"),
    )
    w_user = W.partitionBy("user_id").orderBy("day")
    gap = F.datediff(F.col("day"), F.lag("day").over(w_user))
    new_run = F.when(
        gap.isNull() | (gap > ROLLING_DAYS - 1), 1
    ).otherwise(0)
    runs = (
        du.withColumn("run_id", F.sum(new_run).over(w_user))
        .groupBy("user_id", "run_id")
        .agg(
            F.min("day").alias("s"),
            F.date_add(F.max("day"), ROLLING_DAYS - 1).alias("e"),
        )
    )
    deltas = (
        runs.crossJoin(F.broadcast(bounds))
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("s").alias("d"), F.lit(1).alias("delta")
                    ),
                    F.struct(
                        F.date_add(F.least("e", "hi"), 1).alias("d"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("x")
        )
        .groupBy(F.col("x.d").alias("d"))
        .agg(F.sum("x.delta").alias("dd"))
    )
    calendar = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("target_day")
    )
    # Running sum over the bounded calendar: single-partition window
    # on a days-in-range-sized frame, the documented bounded-prefix
    # pattern (WindowExec's no-partition warning is expected and
    # harmless here).
    w_cal = W.orderBy("target_day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        calendar.join(deltas, calendar.target_day == deltas.d, "left")
        .select(
            "target_day", F.coalesce("dd", F.lit(0)).alias("dd")
        )
        .select(
            "target_day",
            F.sum("dd").over(w_cal).alias("active_users_7d"),
        )
        .filter(F.col("active_users_7d") > 0)
        .select(
            F.date_format("target_day", "yyyy-MM-dd").alias("day"),
            "active_users_7d",
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# events_markov_transitions — first-order journey transition matrix
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
    WITH seq AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    pairs AS (
        SELECT from_type, to_type, count(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
           round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM pairs
    ORDER BY from_type, to_type
"""


@register("events_markov_transitions", oracle_sql=_MARKOV_ORACLE)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user journeys:
    P(next event type | current event type), estimated from every
    consecutive in-user pair. The session-analysis companion of
    ``events_pattern_detect`` — the pattern op matches known shapes,
    this one LEARNS the transition structure.

    Plan: one user_id Exchange for the lead() window, then a
    (from, to) aggregate whose result is |types|^2 rows (25 here) —
    the normalizing per-from-state window runs on that bounded
    matrix, never on event rows.
    """
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_from = W.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        F.col("n").alias("n_transitions"),
        F.round(F.col("n") * 1.0 / F.sum("n").over(w_from), 6).alias("p"),
    ).orderBy("from_type", "to_type")


# ---------------------------------------------------------------------------
# orders_cohort_ltv — cohort lifetime-value triangle
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
    WITH firsts AS (
        SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort
        FROM orders GROUP BY o_custkey
    ),
    facts AS (
        SELECT f.cohort,
               (year(o.o_orderdate) - year(f.cohort)) * 12
                 + (month(o.o_orderdate) - month(f.cohort)) AS age,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    ),
    cohort_sizes AS (
        SELECT cohort, count(*) AS n_customers FROM firsts GROUP BY cohort
    ),
    tri AS (
        SELECT cohort, age, count(*) AS n_orders, sum(cents) AS cents
        FROM facts GROUP BY cohort, age
    )
    SELECT strftime(t.cohort, '%Y-%m') AS cohort,
           CAST(t.age AS INT) AS age,
           s.n_customers,
           CAST(t.n_orders AS BIGINT) AS n_orders,
           CAST(t.cents AS BIGINT) AS revenue_cents,
           CAST(sum(t.cents) OVER (PARTITION BY t.cohort ORDER BY t.age
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_revenue_cents
    FROM tri t JOIN cohort_sizes s ON t.cohort = s.cohort
    ORDER BY cohort, age
"""


@register("orders_cohort_ltv", oracle_sql=_LTV_ORACLE)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers cohorted by first
    order month, revenue accumulated by cohort age in months — the
    revenue twin of ``events_retention_cohorts``. Exact cents.

    Plan: first-order months are a per-customer min aggregate that
    joins back to orders on custkey (both hash-partition on the
    key); the triangle is (months x months) rows, so the cumulative
    window runs on a calendar-bounded frame.
    """
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort")
    )
    facts = orders.join(firsts, "o_custkey").select(
        "cohort",
        (
            (F.year("o_orderdate") - F.year("cohort")) * 12
            + (F.month("o_orderdate") - F.month("cohort"))
        ).cast("int").alias("age"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    sizes = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    tri = facts.groupBy("cohort", "age").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("cents")
    )
    w_cum = (
        W.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tri.join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM").alias("cohort"),
            "age",
            "n_customers",
            "n_orders",
            F.col("cents").alias("revenue_cents"),
            F.sum("cents").over(w_cum).alias("cum_revenue_cents"),
        )
        .orderBy("cohort", "age")
    )


# ---------------------------------------------------------------------------
# events_forecast_linear — least-squares trend + 7-day forecast
# ---------------------------------------------------------------------------

FORECAST_ANCHOR = "2024-01-01"  # fixture epoch; keeps t small and exact
FORECAST_DAYS = 7

_FORECAST_ORACLE = f"""
    WITH daily AS (
        SELECT date_diff('day', DATE '{FORECAST_ANCHOR}',
                         CAST(date_trunc('day', ts) AS DATE)) AS t,
               count(*) AS n
        FROM events GROUP BY 1
    ),
    fit AS (
        SELECT round(regr_slope(n, t), 6) AS b,
               round(regr_intercept(n, t), 6) AS a,
               max(t) AS t_max
        FROM daily
    )
    SELECT CAST(t_max + step AS INT) AS t,
           strftime(DATE '{FORECAST_ANCHOR}'
                    + to_days(CAST(t_max + step AS INT)), '%Y-%m-%d') AS day,
           round(a + b * (t_max + step), 6) AS forecast
    FROM fit, (SELECT unnest(generate_series(1, {FORECAST_DAYS})) AS step)
    ORDER BY t
"""


@register("events_forecast_linear", oracle_sql=_FORECAST_ORACLE)
def events_forecast_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares linear trend over the daily event-count series,
    extrapolated {7} days past the observed range — the REGR_*
    aggregate family (agg_regression_stats) applied to forecasting.

    t is day offsets from a fixed fixture anchor, keeping the
    regressor small and integer-exact at any scale; slope/intercept
    round(6) once so both engines extrapolate identical lines. The
    daily series is calendar-bounded, so the fit aggregate and the
    7-row forecast are constant-size regardless of corpus scale.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.datediff(
            F.date_trunc("day", "ts"), F.lit(FORECAST_ANCHOR).cast("date")
        ).alias("t")
    ).agg(F.count(F.lit(1)).alias("n"))
    fit = daily.agg(
        F.round(F.expr("regr_slope(n, t)"), 6).alias("b"),
        F.round(F.expr("regr_intercept(n, t)"), 6).alias("a"),
        F.max("t").alias("t_max"),
    )
    steps = spark.range(1, FORECAST_DAYS + 1).select(
        F.col("id").cast("int").alias("step")
    )
    return (
        fit.crossJoin(F.broadcast(steps))
        .select(
            (F.col("t_max") + F.col("step")).cast("int").alias("t"),
            F.date_format(
                F.date_add(
                    F.lit(FORECAST_ANCHOR).cast("date"),
                    (F.col("t_max") + F.col("step")).cast("int"),
                ),
                "yyyy-MM-dd",
            ).alias("day"),
            F.round(
                F.col("a") + F.col("b") * (F.col("t_max") + F.col("step")),
                6,
            ).alias("forecast"),
        )
        .orderBy("t")
    )


# ---------------------------------------------------------------------------
# events_bot_flags — behavioral bot / automation heuristics
# ---------------------------------------------------------------------------

BOT_BURST_PER_MIN = 5  # any minute with >= this many events
BOT_MIN_EVENTS = 20  # low-activity users are never flagged

_BOT_ORACLE = f"""
    WITH per_min AS (
        SELECT user_id, date_trunc('minute', ts) AS m, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    gaps AS (
        SELECT user_id,
               epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)) AS gap
        FROM events
    ),
    stats AS (
        SELECT p.user_id,
               sum(p.n) AS n_events,
               count(*) AS active_minutes,
               max(p.n) AS peak_per_minute,
               min(g.min_gap) AS min_gap_us
        FROM per_min p
        JOIN (SELECT user_id, min(gap) AS min_gap FROM gaps
              WHERE gap IS NOT NULL GROUP BY user_id) g
          ON p.user_id = g.user_id
        GROUP BY p.user_id
    )
    SELECT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(active_minutes AS BIGINT) AS active_minutes,
           CAST(peak_per_minute AS BIGINT) AS peak_per_minute,
           CAST(min_gap_us AS BIGINT) AS min_gap_us,
           n_events >= {BOT_MIN_EVENTS}
             AND (peak_per_minute >= {BOT_BURST_PER_MIN} OR min_gap_us = 0)
             AS bot_suspect
    FROM stats
    ORDER BY user_id
"""


@register("events_bot_flags", oracle_sql=_BOT_ORACLE)
def events_bot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral bot heuristics per user: burst rate (max events in
    any single minute), minimum inter-event gap (exact microseconds — whole-second
    truncation straddles sub-second parts differently per engine,
    caught by the oracle), and an integer-exact suspect flag — the user-side twin of the document-side quality
    gates (doc_profile): training pipelines drop traffic that no
    human could generate before it poisons engagement-derived labels.

    Plan: one user_id-partitioned minute rollup + one lag window,
    both on the same hash partitioning; every statistic is an exact
    integer so the oracle comparison is exact.
    """
    events = load_table(spark, sf_dir, "events")
    per_min = events.groupBy(
        "user_id", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap"),
    )
    min_gaps = (
        gaps.filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(F.min("gap").alias("min_gap_us"))
    )
    stats = (
        per_min.groupBy("user_id")
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("active_minutes"),
            F.max("n").alias("peak_per_minute"),
        )
        .join(min_gaps, "user_id")
    )
    return stats.select(
        "user_id",
        "n_events",
        "active_minutes",
        "peak_per_minute",
        "min_gap_us",
        (
            (F.col("n_events") >= BOT_MIN_EVENTS)
            & (
                (F.col("peak_per_minute") >= BOT_BURST_PER_MIN)
                | (F.col("min_gap_us") == 0)
            )
        ).alias("bot_suspect"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# events_ab_test — two-proportion experiment readout
# ---------------------------------------------------------------------------

AB_SALT = "exp1"
AB_Z_CRIT = 1.959964  # two-sided 5%

_AB_ORACLE = f"""
    WITH assign AS (
        SELECT user_id,
               CASE WHEN ('0x' || substr(md5(user_id || '/{AB_SALT}'), 1, 8))::BIGINT
                         % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS variant
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    outcomes AS (
        SELECT a.variant,
               count(*) AS n_users,
               sum(CASE WHEN coalesce(c.converted, FALSE) THEN 1 ELSE 0 END)
                   AS n_converted
        FROM assign a
        LEFT JOIN (
            SELECT user_id,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 5
                     > count(*) AS converted
            FROM events GROUP BY user_id
        ) c ON a.user_id = c.user_id
        GROUP BY a.variant
    ),
    wide AS (
        SELECT max(CASE WHEN variant = 'control' THEN n_users END) AS n1,
               max(CASE WHEN variant = 'control' THEN n_converted END) AS c1,
               max(CASE WHEN variant = 'treatment' THEN n_users END) AS n2,
               max(CASE WHEN variant = 'treatment' THEN n_converted END) AS c2
        FROM outcomes
    )
    SELECT CAST(n1 AS BIGINT) AS control_users,
           CAST(c1 AS BIGINT) AS control_conversions,
           CAST(n2 AS BIGINT) AS treatment_users,
           CAST(c2 AS BIGINT) AS treatment_conversions,
           round(c1 * 1.0 / n1, 6) AS p_control,
           round(c2 * 1.0 / n2, 6) AS p_treatment,
           round((c2 * 1.0 / n2 - c1 * 1.0 / n1)
                 / nullif(sqrt(((c1 + c2) * 1.0 / (n1 + n2))
                        * (1 - (c1 + c2) * 1.0 / (n1 + n2))
                        * (1.0 / n1 + 1.0 / n2)), 0.0), 6) AS z_stat,
           coalesce(abs((c2 * 1.0 / n2 - c1 * 1.0 / n1)
               / nullif(sqrt(((c1 + c2) * 1.0 / (n1 + n2))
                      * (1 - (c1 + c2) * 1.0 / (n1 + n2))
                      * (1.0 / n1 + 1.0 / n2)), 0.0)) > {AB_Z_CRIT}, FALSE)
               AS significant
    FROM wide
"""


@register("events_ab_test", oracle_sql=_AB_ORACLE)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout: users deal into
    control/treatment by the engine-stable md5 hash (the same salted
    deal as the split/sample family — assignment is reproducible
    across runs, engines, and data growth, the property a real
    experimentation system needs), the outcome is an integer-exact
    "elevated error share" flag (a user's error events exceed 1/5 of
    their activity — purchase-based conversion saturates at 100% on
    this fixture, a degenerate-denominator trap the first version
    actually hit);
    the pooled two-proportion z-statistic and a 5% significance flag
    come out of one 2-row aggregate. A/A-shaped by construction on
    this fixture (the deal is independent of behavior), so the
    EXPECTED readout is "not significant" — pinned in pytest.

    Plan: distinct users -> hash deal (narrow map) -> broadcast-sized
    2-row rollup; the z arithmetic happens on that 1-row frame.
    """
    events = load_table(spark, sf_dir, "events")
    users = events.select("user_id").distinct()
    assign = users.withColumn(
        "variant",
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("/", F.col("user_id"), F.lit(AB_SALT))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            "control",
        ).otherwise("treatment"),
    )
    converted = events.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)) * 5
            > F.count(F.lit(1))
        ).alias("converted")
    )
    outcomes = (
        assign.join(converted, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(
                F.when(F.coalesce(F.col("converted"), F.lit(False)), 1)
                .otherwise(0)
            ).alias("n_converted"),
        )
    )
    wide = outcomes.agg(
        F.max(F.when(F.col("variant") == "control", F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == "control", F.col("n_converted"))).alias("c1"),
        F.max(F.when(F.col("variant") == "treatment", F.col("n_users"))).alias("n2"),
        F.max(F.when(F.col("variant") == "treatment", F.col("n_converted"))).alias("c2"),
    )
    p1 = F.col("c1") * 1.0 / F.col("n1")
    p2 = F.col("c2") * 1.0 / F.col("n2")
    pp = (F.col("c1") + F.col("c2")) * 1.0 / (F.col("n1") + F.col("n2"))
    denom = F.nullif(
        F.sqrt(pp * (1 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))),
        F.lit(0.0),
    )
    z = (p2 - p1) / denom
    return wide.select(
        F.col("n1").cast("long").alias("control_users"),
        F.col("c1").cast("long").alias("control_conversions"),
        F.col("n2").cast("long").alias("treatment_users"),
        F.col("c2").cast("long").alias("treatment_conversions"),
        F.round(p1, 6).alias("p_control"),
        F.round(p2, 6).alias("p_treatment"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce(F.abs(z) > AB_Z_CRIT, F.lit(False)).alias(
            "significant"
        ),
    )


# ---------------------------------------------------------------------------
# customer_rfm_segments — recency / frequency / monetary segmentation
# ---------------------------------------------------------------------------

RFM_ANCHOR = "2002-01-01"  # scoring date: just past the fixture range
RFM_MONEY_BUCKET = 100_000  # $1000 monetary buckets

_RFM_ORACLE = f"""
    WITH base AS (
        SELECT o_custkey,
               date_diff('day', CAST(max(o_orderdate) AS DATE),
                         DATE '{RFM_ANCHOR}') AS rec,
               count(*) AS freq,
               sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   // {RFM_MONEY_BUCKET} AS monb
        FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT count(*) AS n FROM base),
    r_sc AS (
        SELECT rec, CASE WHEN 3 * cum <= n THEN 3
                         WHEN 3 * cum <= 2 * n THEN 2 ELSE 1 END AS r
        FROM (SELECT rec, sum(cnt) OVER (ORDER BY rec) AS cum
              FROM (SELECT rec, count(*) AS cnt FROM base GROUP BY rec)),
             tot
    ),
    f_sc AS (
        SELECT freq, CASE WHEN 3 * cum <= n THEN 3
                          WHEN 3 * cum <= 2 * n THEN 2 ELSE 1 END AS f
        FROM (SELECT freq, sum(cnt) OVER (ORDER BY freq DESC) AS cum
              FROM (SELECT freq, count(*) AS cnt FROM base GROUP BY freq)),
             tot
    ),
    m_sc AS (
        SELECT monb, CASE WHEN 3 * cum <= n THEN 3
                          WHEN 3 * cum <= 2 * n THEN 2 ELSE 1 END AS m
        FROM (SELECT monb, sum(cnt) OVER (ORDER BY monb DESC) AS cum
              FROM (SELECT monb, count(*) AS cnt FROM base GROUP BY monb)),
             tot
    )
    SELECT r || '-' || f || '-' || m AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(min(b.freq) AS BIGINT) AS min_orders,
           CAST(max(b.freq) AS BIGINT) AS max_orders
    FROM base b
    JOIN r_sc USING (rec) JOIN f_sc USING (freq) JOIN m_sc USING (monb)
    GROUP BY segment
    ORDER BY segment
"""


@register("customer_rfm_segments", oracle_sql=_RFM_ORACLE)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: customers score 1-3 on Recency, Frequency,
    and Monetary value, with tercile boundaries computed AT VALUE
    GRAIN (distinct recency days / order counts / $1000 monetary
    buckets) — cumulative customer counts over those bounded value
    tables, compared as exact integers (3*cum <= n), never a global
    per-customer sort. The ABC/skyline bounded-prefix trick applied
    three times and composed into the classic "3-2-1" segment codes.

    Plan: one orders scan -> per-customer rollup; three value-grain
    count tables (calendar-, small-int-, and bucket-bounded) score
    via windows over bounded frames and broadcast back.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_ANCHOR).cast("date"),
            F.max("o_orderdate").cast("date"),
        ).alias("rec"),
        F.count(F.lit(1)).alias("freq"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            / RFM_MONEY_BUCKET
        ).cast("long").alias("monb"),
    )
    base = transient_persist(base)
    n_total = base.agg(F.count(F.lit(1)).alias("n"))

    def tercile(col: str, better_low: bool, out: str) -> DataFrame:
        counts = base.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        order = F.asc(col) if better_low else F.desc(col)
        w = W.orderBy(order).rowsBetween(W.unboundedPreceding, W.currentRow)
        return (
            counts.withColumn("cum", F.sum("cnt").over(w))
            .crossJoin(F.broadcast(n_total))
            .select(
                col,
                F.when(3 * F.col("cum") <= F.col("n"), 3)
                .when(3 * F.col("cum") <= 2 * F.col("n"), 2)
                .otherwise(1)
                .alias(out),
            )
        )

    r_sc = tercile("rec", True, "r")
    f_sc = tercile("freq", False, "f")
    m_sc = tercile("monb", False, "m")
    return (
        base.join(F.broadcast(r_sc), "rec")
        .join(F.broadcast(f_sc), "freq")
        .join(F.broadcast(m_sc), "monb")
        .groupBy(
            F.concat_ws("-", F.col("r"), F.col("f"), F.col("m")).alias(
                "segment"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("freq").alias("min_orders"),
            F.max("freq").alias("max_orders"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# events_entropy_profile — behavioral diversity per user
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
    WITH tc AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    ),
    tot AS (
        SELECT user_id, sum(n) AS total, count(*) AS n_types FROM tc
        GROUP BY user_id
    )
    SELECT t.user_id,
           CAST(t.total AS BIGINT) AS n_events,
           CAST(t.n_types AS BIGINT) AS n_types,
           round(-sum((tc.n * 1.0 / t.total) * ln(tc.n * 1.0 / t.total)), 6)
               AS type_entropy,
           round(-sum((tc.n * 1.0 / t.total) * ln(tc.n * 1.0 / t.total))
                 / ln(t.n_types), 6) AS normalized_entropy
    FROM tc JOIN tot t USING (user_id)
    WHERE t.n_types > 1
    GROUP BY t.user_id, t.total, t.n_types
    ORDER BY t.user_id
"""


@register("events_entropy_profile", oracle_sql=_ENTROPY_ORACLE)
def events_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution, raw and
    normalized by ln(#types) — the behavioral-diversity signal that
    complements ``events_bot_flags``: scripted traffic concentrates on
    few types (entropy near 0), organic use spreads (near 1
    normalized). Single-type users drop (normalization undefined).

    Plan: one (user, type) count aggregate — the bounded |users| x
    |types| frame — and a per-user rollup; the entropy sum has at most
    |types| (5) float terms per user, well inside the round(6)
    convention.
    """
    events = load_table(spark, sf_dir, "events")
    tc = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = tc.groupBy("user_id").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("n") * 1.0 / F.col("total")
    return (
        tc.join(tot, "user_id")
        .filter(F.col("n_types") > 1)
        .groupBy("user_id", "total", "n_types")
        .agg(F.sum(p * F.log(p)).alias("negent"))
        .select(
            "user_id",
            F.col("total").alias("n_events"),
            "n_types",
            F.round(-F.col("negent"), 6).alias("type_entropy"),
            F.round(
                -F.col("negent") / F.log(F.col("n_types") * 1.0), 6
            ).alias("normalized_entropy"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# part_supplier_hhi — market-concentration index per part
# ---------------------------------------------------------------------------

_HHI_ORACLE = """
    WITH sq AS (
        SELECT l_partkey AS part, l_suppkey AS supp,
               sum(CAST(l_quantity AS DECIMAL(18,4))) AS q
        FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
        SELECT part, sum(q) AS tq, count(*) AS n_suppliers FROM sq
        GROUP BY part
    )
    SELECT s.part AS p_partkey,
           CAST(t.n_suppliers AS BIGINT) AS n_suppliers,
           round(CAST(sum(CAST(round(
                     (CAST(s.q AS DOUBLE) / CAST(t.tq AS DOUBLE))
                     * (CAST(s.q AS DOUBLE) / CAST(t.tq AS DOUBLE)), 12)
                 AS DECIMAL(18,12))) AS DOUBLE), 6) AS hhi
    FROM sq s JOIN tot t USING (part)
    WHERE t.n_suppliers >= 2
    GROUP BY s.part, t.n_suppliers
    ORDER BY p_partkey
"""


@register("part_supplier_hhi", oracle_sql=_HHI_ORACLE)
def part_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supply-concentration index per part: the
    sum of squared supplier quantity shares (1.0 = sole supplier,
    1/n = perfectly split) — the procurement-risk metric a supply
    dashboard computes over the whole catalog. Single-supplier parts
    drop (HHI trivially 1).

    Plan (r12, guide §2.4 — one pass instead of two): the
    (part, supplier) quantity sums feed BOTH the per-part totals and
    the share terms, which the previous shape expressed as an
    aggregate + self-join — TWO full lineitem scans and five
    Exchanges (plans/r12/part_supplier_hhi_before.txt). The per-part
    totals are an unbounded window over the same key, so one window
    over the (part, supp) frame replaces the join arm: ONE scan,
    partial-aggregated (part, supp) exchange, a part-keyed window
    exchange of the node-sized frame, and the final rollup reuses the
    window's partitioning (plans/r12/part_supplier_hhi_after.txt —
    3 Exchanges incl. the output sort). Quantity sums stay exact
    DECIMAL so each share-squared term is engine-identical, and the
    terms round(12) into DECIMAL before summing — the order-free
    accumulation the CUSUM fix established (a plain float sum here
    flipped three round(6) boundaries at sf0.01, caught by the
    oracle); window-vs-join totals are the same decimal sums, so the
    result is bit-identical.
    """
    from pyspark.sql import Window as W

    lineitem = load_table(spark, sf_dir, "lineitem")
    sq = lineitem.groupBy(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
    per_part = W.partitionBy("part")
    sq = sq.withColumn("tq", F.sum("q").over(per_part)).withColumn(
        "n_suppliers", F.count(F.lit(1)).over(per_part)
    )
    share = F.col("q").cast("double") / F.col("tq").cast("double")
    return (
        sq.filter(F.col("n_suppliers") >= 2)
        .groupBy(F.col("part").alias("p_partkey"), F.col("n_suppliers"))
        .agg(
            F.round(
                F.sum(
                    F.round(share * share, 12).cast("decimal(18,12)")
                ).cast("double"),
                6,
            ).alias("hhi")
        )
        .transform(ordered_result, "p_partkey")
    )
