"""Blocked fuzzy string matching (edit-distance entity resolution) —
the record-linkage primitive: find id pairs whose names are within a
small Levenshtein distance WITHOUT the all-pairs O(n²) join.

Shape: the classic blocked-ER pipeline —

  1. block key (caller-supplied expression: first token, phonetic code,
     prefix, …) ⟹ the self-join is an EQUI-join co-partitioned on the
     block, quadratic only within a block, AQE-skew-splittable on a hot
     block (blocking recall/cost is part of the operator contract, as
     in the dedup literature; the exact-recall path is PassJoin-style
     pigeonhole segment blocking, which this key slot can express),
  2. integer length-band prefilter |len(a)−len(b)| ≤ k — a lower bound
     on edit distance, so it is exact and removes most candidates
     before any DP runs,
  3. verify with the built-in `levenshtein` expression — JVM
     whole-stage-codegen, never a Python UDF; Spark and DuckDB share
     the textbook DP so the distances are engine-identical integers.

Exact duplicates (distance 0) are excluded by default: they belong to
the exact-dedup operator; this one exists for the NEAR-misses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    max_dist: int = 3,
    include_exact: bool = False,
) -> DataFrame:
    """(a, b, dist) with a < b, same block, length band ≤ max_dist and
    levenshtein(name_a, name_b) ≤ max_dist (> 0 unless include_exact)."""
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    side = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(name_col).alias("_nm"),
        block.alias("_blk"),
        F.length(name_col).alias("_ln"),
    )
    a = side.select(
        F.col("_id").alias("a"),
        F.col("_nm").alias("_na"),
        "_blk",
        F.col("_ln").alias("_la"),
    )
    b = side.select(
        F.col("_id").alias("b"),
        F.col("_nm").alias("_nb"),
        "_blk",
        F.col("_ln").alias("_lb"),
    )
    d = F.levenshtein(F.col("_na"), F.col("_nb"))
    lo = 0 if include_exact else 1
    return (
        a.join(b, "_blk")
        .where(
            (F.col("a") < F.col("b"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
        )
        .where((d >= lo) & (d <= max_dist))
        .select("a", "b", d.cast("int").alias("dist"))
    )
