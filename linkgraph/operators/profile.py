"""Column profiling: per-column null / distinct / range / mean summary.

The first thing a data pipeline runs against an unfamiliar (or freshly
landed) table is a profile — null rates, cardinalities, value ranges —
both for schema-drift detection (compare today's profile against
yesterday's, cf. `reconcile.py` for the row-level analog) and for
planning decisions (a column with n_distinct == n_rows is a key; a
99%-null column should not drive a join).

Scale shape: ONE scan of the table computes every metric for every
requested column — all metrics are algebraic aggregates collected in a
single `agg(...)` (partial map-side combine; the shuffle carries one
partial row per partition), except n_distinct which Spark plans via
expand + two-phase hash aggregate (still one scan, one shuffle keyed
on values).  The single result row is then unpivoted driver-free with
an `explode` of a literal-built struct array.  No UDFs, no driver
actions, no per-column passes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def data_profile(
    df: DataFrame, cols: Sequence[str], round_to: int = 6
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_v, max_v, mean_v) —
    one row per requested numeric column, ordered by col_name.  min/max/
    mean are cast to double so mixed-type column sets share one schema.
    """
    if not cols:
        raise ValueError("data_profile: need at least one column")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.avg(F.col(c).cast("double")).alias(f"{c}__mean"),
        ]
    row = df.agg(*aggs)
    packed = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").cast("long").alias("n_rows"),
            (F.col("__n") - F.col(f"{c}__nn")).cast("long").alias("n_nulls"),
            F.col(f"{c}__nd").cast("long").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
            F.round(F.col(f"{c}__mean"), round_to).alias("mean_v"),
        )
        for c in cols
    ]
    return (
        row.select(F.explode(F.array(*packed)).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )
