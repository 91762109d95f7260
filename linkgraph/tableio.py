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
    if os.path.exists(ident_or_path) or ident_or_path.endswith(".parquet"):
        return spark.read.parquet(ident_or_path)
    if _iceberg_available(spark):
        return spark.read.format("iceberg").load(ident_or_path)
    return spark.table(ident_or_path)


def write_table(df: DataFrame, ident_or_path: str, mode: str = "overwrite") -> None:
    if _iceberg_available(df.sparkSession) and not ident_or_path.startswith("/"):
        df.writeTo(ident_or_path).createOrReplace()
    else:
        df.write.mode(mode).parquet(ident_or_path)


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
