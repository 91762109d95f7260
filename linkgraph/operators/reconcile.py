"""Table reconciliation by bucket checksums — "diff two 100 TB snapshots"
without joining them row-by-row.

Stage 1 hashes every row once per side and folds it into its key-bucket's
(count, checksum-sum) pair: a map-side-combined aggregate that emits
≤`buckets` rows per side no matter how big the inputs are.  Joining the
two tiny summaries yields the set of buckets that differ at all.

Stage 2 re-reads ONLY rows whose key hashes into a differing bucket (the
bucket predicate is a deterministic function of the key, so it pushes to
the scan on both sides — and prunes partitions outright when the tables
are stored bucketed on the same key hash), then full-outer-joins that
small slice to classify each key as left_only / right_only / changed.

If the snapshots are identical, total cost is two scans and a
`buckets`-row join — no shuffle of either table.  If they differ in d
buckets, stage 2 touches ~d/buckets of the data.  Checksums are SUMS of
xxhash64 over the compared columns (order-independent, mergeable); a
differing bucket escapes detection only on a 64-bit sum collision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key_cols: list[str], buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(buckets))


def _row_hash(cols: list[str]):
    # null-safe: hash the value and a presence flag per column so
    # (NULL, 'x') never collides with ('x', NULL)
    if not cols:  # key-only table: presence alone decides, 'changed' can't occur
        return F.lit(0).cast("long")
    parts = []
    for c in cols:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00")))
        parts.append(F.col(c).isNull().cast("int"))
    return F.xxhash64(*parts)


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    buckets: int = 256,
) -> DataFrame:
    """(key..., status) for every key whose row differs between the two
    tables; status ∈ {'left_only', 'right_only', 'changed'}.  Keys are
    assumed unique per side (snapshot semantics)."""
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in key_cols]
    allc = list(key_cols) + list(compare_cols)

    def summary(df: DataFrame) -> DataFrame:
        return (
            df.select(
                _bucket(key_cols, buckets).alias("b"),
                _row_hash(allc).cast("decimal(38,0)").alias("h"),
            )
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("h").alias("s"))
        )

    ls, rs = summary(left), summary(right)
    bad = (
        ls.alias("l")
        .join(rs.alias("r"), "b", "full")
        .where(
            F.col("l.n").isNull()
            | F.col("r.n").isNull()
            | (F.col("l.n") != F.col("r.n"))
            | (F.col("l.s") != F.col("r.s"))
        )
        .select("b")
    )

    def slice_side(df: DataFrame) -> DataFrame:
        return df.withColumn("__b", _bucket(key_cols, buckets)).join(
            F.broadcast(bad.withColumnRenamed("b", "__b")), "__b"
        )

    lt = slice_side(left).select(
        *key_cols, _row_hash(compare_cols).alias("__lh")
    )
    rt = slice_side(right).select(
        *key_cols, _row_hash(compare_cols).alias("__rh")
    )
    j = lt.join(rt, key_cols, "full")
    return j.where(
        F.col("__lh").isNull()
        | F.col("__rh").isNull()
        | (F.col("__lh") != F.col("__rh"))
    ).select(
        *key_cols,
        F.when(F.col("__rh").isNull(), F.lit("left_only"))
        .when(F.col("__lh").isNull(), F.lit("right_only"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
