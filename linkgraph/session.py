"""SparkSession factory with the engine's standard configuration.

Design for multi-executor clusters (AQE, skew-join handling, Arrow) while
running local[N] in the sandbox.  All graph jobs assume these confs; tests
and bench share this factory so plans are comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partitioning: a multiple of cores; AQE coalesces down at runtime.
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("LINKGRAPH_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "linkgraph",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with AQE + Arrow enabled.

    On a real cluster this is driven by spark-submit --py-files; ``master``
    is only set explicitly for local runs / the scaling bench.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    mem = os.environ.get("LINKGRAPH_DRIVER_MEM", "16g")
    # Pre-size the heap (-Xms == -Xmx) and cap GC worker threads: G1 heap
    # expansion under 32-thread allocation pressure stalls the world
    # repeatedly (measured: a 2.5s scan stage degrading to 43s after an
    # iterative kernel churned the heap; multi-second young pauses in the
    # GC log).  A fixed heap + bounded ParallelGCThreads removes it
    # entirely (43s -> 1.7s).  On a real cluster the same applies to
    # spark.executor.extraJavaOptions.
    gc_threads = os.environ.get("LINKGRAPH_GC_THREADS", "16")
    java_opts = f"-Xms{mem} -XX:ParallelGCThreads={gc_threads}"
    confs = {
        "spark.sql.shuffle.partitions": str(sp),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
        # Graph state rows are tiny (a vid + 16 int64 limbs); favor broadcast
        # of small frontiers but keep the default threshold modest.
        "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
        "spark.driver.memory": mem,
        # local mode: all tasks run in the driver JVM.  On a cluster, apply
        # the same -Xms/-XX:ParallelGCThreads recipe to
        # spark.executor.extraJavaOptions sized to executor memory.
        "spark.driver.extraJavaOptions": java_opts,
        "spark.ui.enabled": "false",
        # ContextCleaner stays ON by default: long-running or multi-tenant
        # deployments must not leak shuffle files / broadcast blocks.  The
        # bench harness sets LINKGRAPH_REF_TRACKING=false for bounded
        # spark-submit batch runs, where async cleanup storms contend with
        # running tasks (measured 3-6x per-iteration slowdown) and all
        # blocks are reclaimed at application exit anyway.
        "spark.cleaner.referenceTracking": os.environ.get(
            "LINKGRAPH_REF_TRACKING", "true"
        ),
    }
    if extra_conf:
        confs.update(extra_conf)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
