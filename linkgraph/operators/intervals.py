"""Interval overlap join — the bucketized range-join (SURVEY.md §2 J7
family).  Spark plans a bare `a.start <= b.end AND b.start <= a.end`
join as BroadcastNestedLoopJoin (or a cartesian product when neither
side broadcasts): O(|L|·|R|) per key and the single most common way an
event pipeline dies at scale.  The distributed form is the bucket
decomposition every range-join implementation uses (Databricks' range
join hint, postgres GiST interval join):

  1. each interval explodes to the fixed-width time buckets it covers
     (`sequence(start DIV w, end DIV w)` — replication = len/w + 1),
  2. pairs meet in an EQUI-join on (key, bucket) — hash-shuffled,
     AQE-skew-splittable, never nested-loop,
  3. the overlap predicate verifies inside the bucket, and
  4. each pair is attributed to exactly ONE bucket — the bucket of
     `greatest(l.start, r.start)`, which for an overlapping pair lies
     inside BOTH intervals' bucket spans — so no distinct/dedup shuffle
     is ever needed.

`bucket_s` is the replication-vs-verify knob: small buckets replicate
long intervals; large buckets make the per-(key,bucket) verify
quadratic in its residents.  Set it near the median interval length.

Portability: all arithmetic is exact integer epoch seconds; a constant
engine timezone shift moves both sides' epochs equally, so bucket
equality per engine, the overlap predicate, and `overlap_s` (a
difference) are all shift-invariant — outputs carry no absolute epoch.
Closed-interval convention: touching intervals overlap with
overlap_s = 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    lstart: str = "start_s",
    lend: str = "end_s",
    rstart: str = "start_s",
    rend: str = "end_s",
    bucket_s: int = 3600,
) -> DataFrame:
    """All overlapping (left, right) interval pairs matching on `on`,
    with every non-key/non-endpoint column of both inputs carried
    through (caller aliases collisions) plus `overlap_s =
    least(ends) - greatest(starts)`.  Endpoints are integer epoch
    seconds with start <= end; each overlapping pair appears exactly
    once."""
    if bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    w = F.lit(bucket_s)
    lb = left.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lstart) / w).cast("long"),
                F.floor(F.col(lend) / w).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(rstart) / w).cast("long"),
                F.floor(F.col(rend) / w).cast("long"),
            )
        ),
    )
    anchor = F.floor(F.greatest(F.col(lstart), F.col(rstart)) / w).cast("long")
    return (
        lb.join(rb, on + ["_b"])
        .where(
            (F.col(lstart) <= F.col(rend))
            & (F.col(rstart) <= F.col(lend))
            & (F.col("_b") == anchor)
        )
        .drop("_b")
        .withColumn(
            "overlap_s",
            (
                F.least(F.col(lend), F.col(rend))
                - F.greatest(F.col(lstart), F.col(rstart))
            ).cast("long"),
        )
    )


def interval_union(
    intervals: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start_s",
    end_col: str = "end_s",
    id_col: str = "event_id",
) -> DataFrame:
    """Merged interval coverage per key: (key, n_blocks, covered_s,
    max_block_s) after unioning overlapping-or-touching [start, end]
    intervals — the classic sweep, expressed as gaps-and-islands on the
    RUNNING MAX of interval ends (a start strictly past every earlier
    end opens a new block).

    Same one-shuffle shape as `scd.change_intervals`: both windows and
    the block aggregate partition on `key_col`, so Spark reuses a single
    exchange; ordering is (start, end, id) — a strict total order, so
    blocks are engine- and retry-deterministic.  Outputs are integer
    second DIFFERENCES, hence timezone-shift-invariant (same argument
    as `interval_join` above).
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col, id_col)
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = intervals.select(
        key_col,
        start_col,
        end_col,
        id_col,
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("_nb"),
    ).withColumn("_blk", F.sum("_nb").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    blocks = marked.groupBy(key_col, "_blk").agg(
        (F.max(end_col) - F.min(start_col)).cast("long").alias("len_s")
    )
    return blocks.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("len_s").cast("long").alias("covered_s"),
        F.max("len_s").cast("long").alias("max_block_s"),
    )
