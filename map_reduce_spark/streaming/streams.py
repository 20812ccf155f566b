"""Structured Streaming slice over the ``events`` fixture.

Streaming analogues of the batch queries in ``events_batch.py`` plus
the stream-only operators (watermarked late-data handling, session
windows, streaming dedup). The fixture parquet is replayed as a file
source with ``Trigger.AvailableNow`` so every query is deterministic
and batch-equivalent — the property the tests assert.

Scale notes: each query's state is bounded by its watermark —
windows/dedup keys older than the watermark are evicted, so state
size is O(events per watermark horizon), independent of total stream
length. That is the 100 TB-stream design constraint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream with typed event time.

    Streaming sources must not infer, so the schema is taken from a
    one-off batch metadata read of the same file (a footer-only driver
    op). That keeps the stream dtype-adaptive across fixture
    generations (TIMESTAMP(NANOS)-as-long vs TIMESTAMP(MICROS)) with
    the exact same normalization as the batch path.
    """
    from map_reduce_spark.sources.tables import load_events_raw, normalize_event_ts

    # load_events_raw sets nanosAsLong (required for a
    # TIMESTAMP(NANOS) fixture generation; no-op for MICROS) and
    # serves the raw scan from the session-scoped memo (r12: ~0.6 s
    # of driver-side schema inference per call otherwise, paid by
    # every streaming replay builder).
    raw_schema = load_events_raw(spark, sf_dir).schema
    # The file stream source needs a directory; select just the events
    # file out of the fixture dir with a glob filter.
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw)


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregate (append-able sink)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """1 h windows sliding every 30 min, watermarked."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def session_window_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Event-time session windows (30-min inactivity gap) per user.

    The streaming-native form of operators/windows.sessionize_user_events;
    session state merges incrementally and is evicted past the watermark.
    """
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("sw.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(events: DataFrame) -> DataFrame:
    """Exactly-once event delivery: drop duplicate event_ids within the
    watermark horizon (state bounded by the watermark)."""
    return events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(["event_id"])


def stream_static_segment_counts(
    events: DataFrame, customers: DataFrame, window: str = "1 hour"
) -> DataFrame:
    """Stream-static enrichment join + windowed aggregate: each event
    enriched with its user's market segment from the STATIC customer
    dimension, then counted per (window, segment).

    The remaining join topology in the streaming matrix (stream-stream
    interval join and all window families are covered elsewhere): the
    static side is a plain batch DataFrame that Spark re-plans into
    every microbatch — no state, no watermark needed on the dim side,
    and with a dim-sized static side the per-microbatch join is a
    broadcast hash join, the standard enrich shape for a 100 TB
    stream against a catalog dimension. The watermark bounds only the
    aggregate's window state, exactly as in ``tumbling_counts``.
    """
    dim = customers.select(
        F.col("c_custkey").alias("user_key"), "c_mktsegment"
    )
    return (
        events.withWatermark("ts", "2 hours")
        .join(F.broadcast(dim), F.col("user_id") == F.col("user_key"))
        .groupBy(F.window("ts", window).alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "c_mktsegment",
            "n_events",
            "total_value",
        )
    )


def stream_stream_error_click_join(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: each error event matched to the same
    user's click events in the preceding 30 minutes.

    The canonical streaming-join shape: both sides carry a watermark
    and the join condition bounds event-time distance, so each side's
    buffered state is evicted once the other side's watermark passes
    the interval — state stays O(events per horizon) regardless of
    stream length. An unbounded-condition stream-stream join would be
    rejected by Spark in append mode; this form is the 100 TB-stream
    design.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("error_ts"),
            F.col("event_id").alias("error_id"),
        )
        .withWatermark("error_ts", "1 hour")
    )
    return errors.join(
        clicks,
        (F.col("e_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("error_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("click_ts") <= F.col("error_ts")),
        "inner",
    ).select("error_id", "e_user", "error_ts", "click_id", "click_ts")


# NOTE r10: the first draft of the bound contract kept the memory
# sink for complete/update modes under an absolute 5M-row driver cap.
# Running the sf10 registry sweep under it immediately tripped the
# cap — streaming_session_windows' complete-mode replay materializes
# 9.5M session rows at that scale — proving those outputs are
# state-sized but NOT driver-sized. Complete/update replays therefore
# now drain through a foreachBatch parquet sink (overwrite-per-batch
# for complete — last batch IS the state; append for update — the
# same multiset the memory sink accumulated), so materialization is
# executor-side like the append path, and the declared bound remains
# as the semantic assertion that output tracks STATE, not stream
# length.

# Unique-per-call replay sinks: one counter per process, one root per
# Spark application. Old replay dirs from the same session stay
# readable (a caller holding a previous replay's DataFrame can still
# collect it — ADVICE r9); the whole session root is removed at
# interpreter exit, and concurrent processes never collide because the
# root embeds the applicationId.
import itertools as _itertools

_REPLAY_SEQ = _itertools.count()
_REPLAY_ROOTS_CLEANED: set[str] = set()


def _fresh_replay_dirs(spark: SparkSession, query_name: str) -> tuple[str, str]:
    import atexit
    import shutil
    import tempfile

    root = (
        f"{tempfile.gettempdir()}/mrs_replay_"
        f"{spark.sparkContext.applicationId}"
    )
    if root not in _REPLAY_ROOTS_CLEANED:
        _REPLAY_ROOTS_CLEANED.add(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    seq = next(_REPLAY_SEQ)
    base = f"{root}/{query_name}_{seq:04d}"
    return f"{base}/out", f"{base}/cp"


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    state_partitions: int = 8,
    state_rows_bound: int | None = None,
) -> DataFrame:
    """Drive a streaming query to completion over all available input
    (Trigger.AvailableNow) and return the materialized result.

    Deterministic replay used by tests, batch-parity checks, and the
    registered driver-gate entries.

    State-store parallelism is fixed at stream START from
    spark.sql.shuffle.partitions; a bounded replay's state is tiny, so
    cluster-width state tasks are pure scheduling overhead (~2x the
    query's runtime measured at 32). The pin is applied around
    ``start()`` here — once, for every replay — and restored after the
    drain; a real deployment sizes this to cluster width once, at
    stream start, because it is frozen into the checkpoint.

    Concurrency hazard (r5 ADVICE): the pin mutates the PROCESS-GLOBAL
    ``spark.sql.shuffle.partitions`` for the duration of the drain, so
    a batch query planned concurrently on the same session would
    silently get ``state_partitions`` shuffle partitions. Fine for the
    single-threaded driver gate and tests that call this; do NOT call
    it from a thread racing other planning on the session (scope the
    pin per-query once Spark exposes query-level shuffle config).

    State-bound contract (r9 verdict item 6, re-shaped by the r10 sf10
    measurement — see the NOTE above): complete/update-mode replays
    drain through a foreachBatch parquet sink (overwrite-per-batch for
    complete, append for update), so nothing stream- OR state-sized is
    ever materialized on the driver. Every such caller must still
    declare ``state_rows_bound`` — an a-priori bound on the query's
    state row count computed from the fixture's key dimensions (users
    x session slots, windows x types, ...) — and the drain raises if
    the sunk output exceeds it: the bound is the loud assertion that
    the query's output tracks STATE, so an unbounded-key complete-mode
    query cannot silently regrow the scale-killer class.
    """
    spark = stream_df.sparkSession
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(state_partitions))
    try:
        if output_mode == "append":
            # Append-mode replays sink to PARQUET FILES and read back,
            # not the memory sink: the memory sink materializes every
            # output row into driver/executor memory — the collect
            # anti-pattern at replay sizes (r9 measured the sf10 dedup
            # replay ~2x faster file-sinked, and at 100 TB the memory
            # sink simply does not fit; the file sink is also what a
            # real deployment writes — Spark's idempotent
            # _spark_metadata commit protocol, same as
            # streaming_idempotent_sink). Complete/update modes keep
            # the memory sink — the file sink does not support them,
            # and their outputs are state-sized (bounded), declared
            # and enforced via ``state_rows_bound`` below.
            out, cp = _fresh_replay_dirs(spark, query_name)
            q = (
                stream_df.writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", cp)
                .queryName(query_name)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            # Explicit schema: a replay that legally emits zero rows
            # (everything still inside the watermark) leaves no part
            # files to infer from.
            return spark.read.schema(stream_df.schema).parquet(out)
        if state_rows_bound is None:
            raise ValueError(
                f"replay {query_name!r} ({output_mode} mode) must declare "
                "state_rows_bound — the a-priori state-sized row bound "
                "asserting its output tracks state, not stream length"
            )
        bound = int(state_rows_bound)
        import os

        out, cp = _fresh_replay_dirs(spark, query_name)
        os.makedirs(out, exist_ok=True)

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            # complete: each batch carries the FULL state — overwrite
            # the sink root, so the last batch's write is the drained
            # result (a retry overwrites with identical content).
            # update: each batch carries the touched rows; the
            # accumulated multiset is the union of batches. Each batch
            # writes its OWN subdirectory keyed by batch_id in
            # overwrite mode (r10 ADVICE): foreachBatch is
            # at-least-once, so a retried microbatch re-delivers the
            # same (batch_id, data) — overwriting its own directory
            # makes the retry idempotent, where a flat append would
            # double-count the batch (corrupting the durable multiset
            # and spuriously tripping the state_rows_bound check).
            if output_mode == "complete":
                batch_df.write.mode("overwrite").parquet(out)
            else:
                batch_df.write.mode("overwrite").parquet(f"{out}/b{batch_id}")

        q = (
            stream_df.writeStream.foreachBatch(sink)
            .outputMode(output_mode)
            .option("checkpointLocation", cp)
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # recursiveFileLookup picks up the per-batch subdirectories of
        # update mode (named b<id>, NOT key=value, precisely so no
        # partition column is inferred) and is a no-op for complete
        # mode's flat layout.
        got = (
            spark.read.schema(stream_df.schema)
            .option("recursiveFileLookup", "true")
            .parquet(out)
        )
        n = got.count()  # parquet-footer-cheap, executor-side
        if n > bound:
            raise RuntimeError(
                f"replay {query_name!r} sank {n} rows > declared state "
                f"bound {bound} — output is not tracking state; the "
                "query contract or the declared bound is wrong"
            )
        return got
    finally:
        spark.conf.set(key, prev)


def events_source_files(sf_dir: str) -> int:
    """Number of files the events file-stream source can see — the
    a-priori bound on an AvailableNow drain's microbatch count (the
    file source assigns whole files to batches and every non-empty
    batch consumes at least one new file, so batches <= files
    regardless of any maxFilesPerTrigger/read-limit option; r10
    ADVICE replaced a hard-coded 8-batch assumption with this).
    Handles both fixture shapes: ``events.parquet`` as a single file
    (the current generator) and as a directory of part files."""
    import glob as _glob
    import os as _os

    path = _os.path.join(sf_dir, "events.parquet")
    if _os.path.isdir(path):
        return max(1, len(_glob.glob(_os.path.join(path, "*.parquet"))))
    return 1


_STATE_DIMS_CACHE: dict[tuple[str, str], tuple[int, int, int]] = {}


def events_state_dims(spark: SparkSession, sf_dir: str) -> tuple[int, int, int]:
    """(distinct users, distinct event types, horizon in hours) of the
    events fixture — the key dimensions the memory-sink replays use to
    declare their a-priori state row bounds (see ``run_available_now``).
    One tiny agg job per (applicationId, sf_dir), memoized; the scan
    cost is a fraction of the replay that needs it.
    """
    import math

    from map_reduce_spark.sources import load_table

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _STATE_DIMS_CACHE:
        row = (
            load_table(spark, sf_dir, "events")
            .agg(
                F.countDistinct("user_id").alias("u"),
                F.countDistinct("event_type").alias("t"),
                F.min(F.col("ts").cast("double")).alias("lo"),
                F.max(F.col("ts").cast("double")).alias("hi"),
            )
            .collect()[0]
        )
        horizon_h = int(math.ceil((row.hi - row.lo) / 3600.0)) + 1
        _STATE_DIMS_CACHE[key] = (int(row.u), int(row.t), horizon_h)
    return _STATE_DIMS_CACHE[key]


# Phase-2 slice of the checkpoint-recovery replay: ~1% of events,
# touching about half the fixture's users — so the recovery result's
# semi-join against "users updated after restart" is meaningful (a
# predicate touching every user would still prove state restoration
# via the counts, but would not exercise update-mode's emit-only-
# touched contract).
CKPT_PHASE2_MOD = 101


def checkpoint_recovery_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the checkpoint-recovery contract as a deterministic replay
    and return the POST-RESTART batch: per-user totals emitted by a
    query RESTARTED from a checkpoint after new data arrived.

    SESSION-CACHED (module-level ``session_cached`` wrap below): the
    two-run replay fires once per (applicationId, sf_dir) no matter
    how often the registered builder is called.

    Sequence (the redeploy story a 100 TB pipeline leans on):
      1. phase-1 events (event_id % CKPT_PHASE2_MOD != 0) land in a
         scratch source dir; a stateful per-user aggregate drains them
         under a checkpoint (Trigger.AvailableNow) and STOPS.
      2. phase-2 events (the remaining ~1%) arrive as a new file.
      3. a FRESH query starts from the SAME checkpoint. The file
         source's committed offsets skip phase 1; the restored state
         store carries every user's phase-1 counts. Update mode then
         emits exactly the users touched by phase 2, each with totals
         spanning BOTH phases.
    The returned frame is therefore SQL-checkable against the batch
    oracle "full-history totals, for users appearing in phase 2" —
    equality holds ONLY if the restart both skipped the old offsets
    (no double count) and restored the state (no undercount), which is
    what puts recovery on the hash gate rather than pytest alone.

    Mechanics: the memory sink refuses recovery, so the recoverable
    sink is ``foreachBatch`` (the mechanism a parquet/Delta upsert
    sink uses), collecting the update stream last-write-wins per user
    — rows bounded by the user count, the same driver-size class as
    the memory sink the other replays use. Scratch + checkpoint dirs
    are keyed by (applicationId, sf_dir) and the whole replay is
    session-cached by the caller, so one drain serves the gate, the
    bench, and audits.
    """
    import hashlib
    import shutil
    import tempfile

    from map_reduce_spark.sources import load_table

    key = hashlib.md5(
        f"{spark.sparkContext.applicationId}|{sf_dir}".encode()
    ).hexdigest()[:12]
    root = f"{tempfile.gettempdir()}/mrs_ckpt_recovery_{key}"
    shutil.rmtree(root, ignore_errors=True)
    src, ckpt = f"{root}/src", f"{root}/ckpt"

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    phase2 = F.col("event_id") % CKPT_PHASE2_MOD == 0
    events.filter(~phase2).write.parquet(f"{src}/p1")

    schema = spark.read.parquet(f"{src}/p1").schema

    def run_once(qname: str, sink_rows: dict) -> None:
        stream = spark.readStream.schema(schema).parquet(f"{src}/p*")
        totals = stream.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )

        def sink(batch_df: DataFrame, _batch_id: int) -> None:
            # update-mode emission: later batches overwrite earlier
            # values for the same user (last write wins) — bounded by
            # the user count, never the event count.
            for r in batch_df.collect():
                sink_rows[r.user_id] = (r.n_events, r.total_value)

        q = (
            totals.writeStream.foreachBatch(sink)
            .queryName(qname)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once(f"ckpt_recovery_p1_{key}", {})  # phase-1 emission discarded
    events.filter(phase2).write.parquet(f"{src}/p2")
    recovered: dict = {}
    run_once(f"ckpt_recovery_p2_{key}", recovered)
    shutil.rmtree(root, ignore_errors=True)

    rows = [
        (int(u), int(n), float(t)) for u, (n, t) in sorted(recovered.items())
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, n_events bigint, total_value double"
    ).orderBy("user_id")


# Module-level wrap (NOT inside the registered builder — a per-call
# wrap would mint a fresh cache each build and re-run the replay).
from map_reduce_spark.sources import session_cached as _session_cached  # noqa: E402

checkpoint_recovery_totals = _session_cached(checkpoint_recovery_totals)



def left_outer_error_click_join(events: DataFrame) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every error LEFT OUTER
    joins same-user clicks in the 30 minutes AFTER it ("was the error
    followed up?").

    The outer-NULL rows ARE the state-eviction emission: an unmatched
    error sits in state until the join watermark passes its match
    horizon (error_ts + 30 min), then emits with NULL click columns.
    Under Trigger.AvailableNow the final no-data batch advances the
    watermark to min(max error ts, max click ts) of the whole input
    and flushes every eviction due by then — measured directly: a
    two-slice mtime-ordered replay and a single-file drain produce the
    IDENTICAL row set, so the registered replay uses the plain
    single-file source like the other gate entries. Errors whose
    horizon the final watermark never passes (the last ~30 min of the
    stream) correctly remain in state, exactly as in an unbounded
    deployment — the oracle states the same frontier.

    Scale: state per side is bounded by the 30-min horizon plus
    watermark lag regardless of stream length, same as the inner
    variant (``stream_stream_error_click_join``).
    """
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", "0 seconds")
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "0 seconds")
    )
    return errors.join(
        clicks,
        (F.col("e_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("error_ts"))
        & (F.col("click_ts") <= F.col("error_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    )


def idempotent_sink_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once FILE sink contract, exercised with a forced batch
    re-execution: a watermarked tumbling aggregate streams into a
    ``foreachBatch`` sink that overwrites a per-batch directory
    (out/batch=<id>), the canonical idempotent upsert-by-batch-id
    pattern for object-store sinks; then the LAST batch's commit
    marker is deleted from the checkpoint and the query restarted, so
    the engine genuinely RE-EXECUTES that batch — same batch id, same
    source offsets, state restored to the pre-batch version — and the
    sink's overwrite absorbs the retry. The read-back of the output
    directory equals the batch aggregate exactly iff (a) no batch
    double-appended and (b) the retry reproduced identical rows.

    This is the third leg of the exactly-once story on the hash gate:
    source-offset skip + state restore (streaming_checkpoint_recovery),
    eviction emission (streaming_left_outer_join), and now sink
    idempotence under re-execution — the failure mode a naive append
    sink fails (it would double-count the retried batch and flip the
    hash).

    Emission frontier: append mode emits a window when the watermark
    passes its END; AvailableNow's closing no-data batch advances the
    watermark to max(ts) - 2 h, so the read-back holds exactly the
    windows with end <= that — the oracle states the same frontier.

    Scale: the per-batch-directory pattern is how production Spark
    jobs land exactly-once parquet on S3/GCS without a transactional
    table format; state and emission bounds are ``tumbling_counts``'s.
    """
    import hashlib
    import os
    import shutil
    import tempfile

    key = hashlib.md5(
        f"{spark.sparkContext.applicationId}|{sf_dir}|sink".encode()
    ).hexdigest()[:12]
    root = f"{tempfile.gettempdir()}/mrs_idem_sink_{key}"
    shutil.rmtree(root, ignore_errors=True)
    out, ckpt = f"{root}/out", f"{root}/ckpt"
    os.makedirs(out, exist_ok=True)

    def run_once() -> set:
        executed: set = set()
        agg = tumbling_counts(read_events_stream(spark, sf_dir))

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            executed.add(int(batch_id))
            batch_df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                agg.writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            # The restarted run reuses the SAME checkpoint; make sure
            # this query has fully left the session's active set first
            # or the conflict detector rejects the restart.
            q.stop()
            import time as _time

            while any(a.id == q.id for a in spark.streams.active):
                _time.sleep(0.05)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        return executed

    run_once()
    # Forced retry: drop the newest commit marker (leaving its offsets
    # entry) — on restart the engine re-executes that batch id against
    # the same offsets with the state store rolled back to the
    # pre-batch version, exactly the crash-between-write-and-commit
    # window a retry must survive.
    commits = sorted(
        (f for f in os.listdir(f"{ckpt}/commits") if f.isdigit()), key=int
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    # Hadoop's ChecksumFs pairs every commit file with a .<name>.crc
    # sidecar; leaving it behind makes the retried commit's rename
    # collide (surfacing as a bogus concurrent-queries error).
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    retried = run_once()
    # The retry must have genuinely RE-EXECUTED the uncommitted batch —
    # otherwise the read-back's correctness proves nothing about sink
    # idempotence (run 1's output alone would already satisfy the
    # oracle). A skipped batch here means the contract went untested:
    # fail loudly rather than report a hollow pass.
    assert int(commits[-1]) in retried, (
        f"restart did not re-execute batch {commits[-1]}; got {retried}"
    )

    got = (
        spark.read.option("basePath", out)
        .parquet(f"{out}/batch=*")
        .drop("batch")
        .orderBy("window_start", "event_type")
    )
    # Materialize before the scratch dir is removed.
    rows = got.collect()
    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "window_start string, event_type string, n_events bigint, total_value double",
    ).orderBy("window_start", "event_type")


idempotent_sink_replay = _session_cached(idempotent_sink_replay)
