"""Slowly-changing-dimension history: value-change intervals per key.

`change_intervals` builds the SCD-type-2 history table every warehouse
eventually needs from an append-only update log: per key, collapse
consecutive rows carrying the SAME tracked value into one validity
interval [valid_from, valid_to), where valid_to is the start of the
next DIFFERENT value (NULL = still current).  This is the classic
gaps-and-islands problem — distinct from `events.py`'s sessionize
(time-GAP islands) in that islands here are delimited by VALUE CHANGES,
not silence.

Shape: two window functions + one aggregate, all partitioned by the
SAME key, so the whole operator is ONE shuffle on `key_col` (Spark
reuses the exchange across same-partitioning windows):
  1. lag(value) over (key, order) marks change points;
  2. a running SUM of change markers numbers the islands (the standard
     two-pass-free islands trick — no row_number subtraction pair);
  3. group by (key, island): first value, min ts, row count;
  4. lead(valid_from) over (key, island-order) closes each interval.
Ordering is (ts, tiebreak_col) — a strict total order, so islands are
engine- and retry-deterministic even under timestamp ties.

At 100 TB the log shuffles once on its natural key and every other step
is partition-local; no self-join, no per-row state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_intervals(
    log: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(key, value, valid_from, valid_to, n_events) — one row per
    maximal run of equal `value_col` per key in (ts, tiebreak) order;
    valid_to is the next run's valid_from (NULL for the current run).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(value_col).over(w)
    marked = log.select(
        key_col,
        value_col,
        ts_col,
        tiebreak_col,
        F.when(
            prev.isNull() | (prev != F.col(value_col)), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("_chg"),
    ).withColumn("_isl", F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    runs = marked.groupBy(key_col, "_isl").agg(
        F.first(value_col).alias(value_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("_isl")
    return runs.select(
        key_col,
        value_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.col("n_events").cast("long").alias("n_events"),
    )
