"""SparkSession factory.

One place that pins every config the engine relies on. Designed for a
real multi-executor cluster (AQE, adaptive skew-join, partition
coalescing) while remaining testable on ``local[N]``.

Scale notes (100 TB design point):
- AQE is on: runtime partition coalescing + skew-join splitting means
  the static ``spark.sql.shuffle.partitions`` only needs to be an
  upper bound; on a cluster it should be ~2-3x total cores.
- ``spark.sql.session.timeZone=UTC`` pins timestamp semantics so
  results are host-independent (and match the DuckDB oracle).
- Arrow is enabled for every pandas interchange (Pandas UDFs,
  ``toPandas``) — the only sanctioned Python data path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "map_reduce_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster leave it unset and submit via spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    nshuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r12 (guide §2.2/§2.4 — scale-adaptive partitioning): by
        # default AQE may not change the output partitioning of a
        # cached plan, so every InMemoryRelation freezes the static
        # shuffle-partition count into all downstream stages — the
        # graph/dedup builders' cached edge/frontier frames ran
        # 64-128 tasks per hop on MB-sized data (pure per-task
        # overhead), and at cluster scale the same freeze would pin
        # whatever constant the session started with instead of
        # sizing partitions to the data. With the flag on, AQE
        # coalesces (or splits) under the cache exactly as it does
        # for uncached plans. Paired min-of-3 at sf0.1:
        # graph_khop 8.54->3.62 s, graph_pagerank 4.71->3.32 s,
        # graph_triangle_count 2.63->1.47 s; oracle gate re-verified
        # green after the change.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        # r12 (guide §1.2 step 2/§7 — per-task vs fixed work): the
        # JVM-wide generated-class cache (janino-compiled
        # WholeStageCodegen/projection units, keyed by generated
        # source) is a STATIC conf capped at 100 entries by default —
        # sized for a handful of hot queries, not a 166-query
        # manifest. A full registry pass creates ~1.5k distinct
        # codegen units, so at 100 entries every bench iteration
        # recompiles nearly every unit (janino + fresh classes →
        # C2 JIT re-warm churn: the "intermittent in-session
        # inflation" measured in session 4). 4096 holds the whole
        # manifest's units; entries are source+class pairs (tens of
        # KB each), so the ceiling is bounded by ~100-200 MB on the
        # 16 GB driver heap. A production long-running session
        # (Thrift server / serving loop) raises this for exactly the
        # same reason; env-overridable for smaller hosts.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "4096"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # ContextCleaner reclaims broadcast/shuffle blocks only when
        # the driver GCs their references, and the default periodic-GC
        # interval (30 min) is longer than a whole registry sweep — on
        # a 16 GB single-JVM session, dozens of queries' broadcast
        # builds accumulated until a later query's (legitimately
        # small) broadcast build threw "not enough memory to build and
        # broadcast" (r11 sf10 sweep, measured). 2 min keeps long
        # multi-query sessions reclaiming; the forced GC is a no-op
        # cost at this cadence.
        .config("spark.cleaner.periodicGC.interval", "2min")
        # GCLocker-starvation spurious OOMs (r12, measured): under a
        # loaded heap with 32 threads doing compressed shuffle/spill
        # IO (JNI critical sections pin the GC lock), tasks died with
        # "Retried waiting for GCLocker too often allocating 3 words"
        # — an OutOfMemoryError thrown after only TWO retry attempts
        # (the JDK<=21 default) while the heap still had room; the
        # same sweep prefix OOM'd deterministically at sf10 on two
        # consecutive trees at query 16, always with word-sized
        # allocations. Raising the retry budget removes the spurious
        # failure mode (the real-exhaustion OOM still fires — a task
        # that cannot allocate after 64 GC-locker waits is genuinely
        # out of memory). JDK 22+ removed the GCLocker entirely for
        # this reason; this is the supported JDK 17 mitigation.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
