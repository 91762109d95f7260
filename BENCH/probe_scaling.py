"""Probe: does the heavy edge-scan stage scale with cores?

Runs a representative expand-shaped job (scan 102M-edge parquet, join a
broadcast 63k-row table, hash-aggregate by dst) at a given master and
maxPartitionBytes; prints wall time and the actual scan split count.

Usage: python BENCH/probe_scaling.py local[8] 134217728
"""
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

master = sys.argv[1] if len(sys.argv) > 1 else "local[32]"
mpb = sys.argv[2] if len(sys.argv) > 2 else str(128 * 1024 * 1024)
path = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/BENCH/data/zipf_100000/edges"

spark = (
    SparkSession.builder.master(master)
    .appName("probe")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", mpb)
    .config("spark.driver.memory", "32g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

edges = spark.read.parquet(path)
print("scan rdd partitions:", edges.rdd.getNumPartitions(), flush=True)

ranks = edges.select(F.col("src").alias("vid")).distinct().withColumn("pr", F.lit(1.0))
ranks = ranks.localCheckpoint(eager=True)

t0 = time.time()
for _ in range(3):
    out = (
        edges.join(F.broadcast(ranks), edges.src == ranks.vid)
        .groupBy("dst")
        .agg(F.sum("pr").alias("acc"))
    )
    out.agg(F.sum("acc")).collect()
dt = time.time() - t0
print(f"RESULT master={master} mpb={mpb} wall={dt:.2f}s", flush=True)
spark.stop()
