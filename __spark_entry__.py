"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship MS-BFS batched closeness on sf0.001.
queries()/oracle_sql(): one entry per implemented operator from
SURVEY.md §2 + training-data ops; oracles run in DuckDB at sf0.01.
Implementations live in linkgraph/entry_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from linkgraph import entry_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return EQ.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)
