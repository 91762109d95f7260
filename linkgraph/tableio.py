"""Table I/O abstraction: Iceberg when a catalog is configured, parquet
directories otherwise (SURVEY.md §0 — no Iceberg jar in the sandbox).

The engine's contract input is `format("iceberg")` tables of transcripts;
every reader here accepts either a catalog identifier ("db.transcripts")
or a filesystem path, so the same pipeline code runs in both environments.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from linkgraph.checkpoint import _iceberg_available


def read_table(spark: SparkSession, ident_or_path: str) -> DataFrame:
    # A URI scheme (s3a://, hdfs://, file://, gs://, abfss://…) is always a
    # PATH — it exists on no driver-local filesystem, so the os.path.exists
    # probe below would fall through and hand it to spark.table(), which
    # throws an identifier parse error.  Path separators likewise can never
    # be catalog identifiers.
    if "://" in ident_or_path or "/" in ident_or_path:
        return spark.read.parquet(ident_or_path)
    if os.path.exists(ident_or_path) or ident_or_path.endswith(".parquet"):
        return spark.read.parquet(ident_or_path)
    if _iceberg_available(spark):
        return spark.read.format("iceberg").load(ident_or_path)
    return spark.table(ident_or_path)


def write_table(df: DataFrame, ident_or_path: str, mode: str = "overwrite") -> None:
    is_path = "://" in ident_or_path or "/" in ident_or_path
    if _iceberg_available(df.sparkSession) and not is_path:
        df.writeTo(ident_or_path).createOrReplace()
    else:
        df.write.mode(mode).parquet(ident_or_path)


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str | None = None,
    sort: bool | list[str] = True,
) -> None:
    """Bucketed+sorted table write: the storage-level half of co-located
    joins (SURVEY.md §2.1 S1/S3).

    Two tables bucketed on the same key with the same bucket count join
    with ZERO Exchange — the shuffle was paid ONCE at write time and is
    amortized over every subsequent join/aggregate on that key (the
    Iceberg analog is a bucket partition transform; this is the
    Spark-native datasource form, which the sandbox's jar-less runtime
    supports).  sort=True adds per-bucket ordering so the join is also
    sort-free: a bucketed SMJ reads both sides streaming.  The reader
    only propagates that ordering behind
    `spark.sql.legacy.bucketedTableScan.outputOrdering=true`, which is
    safe exactly when each bucket is ONE file — guaranteed here by the
    pre-partitioning below.  At 100 TB this
    is the difference between re-shuffling the edge table every analytics
    job and reading it join-ready."""
    # one file per bucket: the reader only trusts sortBy ordering when a
    # bucket is a single file, so pre-partition on the bucket hash — this
    # is the write-time shuffle the whole scheme amortizes
    from pyspark.sql import functions as F

    w = (
        df.repartition(buckets, F.col(key))
        .write.mode("overwrite")
        .bucketBy(buckets, key)
    )
    if sort:
        # sort=True sorts by the bucket key; a list adds secondary columns
        # (e.g. ["src", "dst"] gives the neighbor-sorted edge layout S3/O3
        # expects, CSR-style, straight off the scan)
        w = w.sortBy(*sort) if isinstance(sort, list) else w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)
