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
        "spark.driver.memory": os.environ.get("LINKGRAPH_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
        # Iterative drivers create hundreds of short-lived DataFrames,
        # broadcasts and checkpoint RDDs; the ContextCleaner's async
        # removes contend with running tasks on the BlockManager (measured
        # 3-6x per-iteration slowdown once cleanup storms start).  This
        # engine's jobs are bounded-lifetime spark-submit batches — all
        # files/blocks are reclaimed at application exit — so reference
        # tracking is off by default (LINKGRAPH_REF_TRACKING=true to
        # re-enable for long-running services).
        "spark.cleaner.referenceTracking": os.environ.get(
            "LINKGRAPH_REF_TRACKING", "false"
        ),
    }
    if extra_conf:
        confs.update(extra_conf)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
