"""Deterministic sampling for training-data pipelines (SURVEY.md §2.2/§A8
adjacents): hash-based splits and per-stratum sampling.

Random sampling (`df.sample`, `rand()`) is partition-order-dependent and
irreproducible across engines, cluster sizes and retries — exactly what a
training pipeline cannot tolerate (a retried task resamples, a re-run
reshuffles the split, train/test leak).  Hash bucketing fixes all of it:
`split(row) = f(md5(id))` is a pure column expression, so the assignment
is identical on any cluster shape, any engine (DuckDB oracle included),
and under task retries; rows never shuffle (no exchange at all — the split
is a projection, the stratified filter a predicate); and adding a salt
gives an unlimited family of independent splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.textops.dedup import portable_hash60

BUCKETS = 10_000


def _bucket(id_col: str, salt: str):
    return F.pmod(
        portable_hash60(F.concat(F.col(id_col).cast("string"), F.lit("#" + salt))),
        F.lit(BUCKETS),
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Adds a `split` column assigning each row to a named split with the
    given weights (must sum to ≤ 1; remainder falls into the last split).

    Pure projection: no shuffle, no state, reproducible everywhere.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    b = _bucket(id_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(round(acc * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fraction: float,
    id_col: str,
    salt: str = "strata",
) -> DataFrame:
    """Deterministic ~fraction sample WITHIN each stratum: the hash bucket
    is salted with the stratum value, so every stratum draws an
    independent, reproducible subset.  Pure filter — no shuffle, and the
    sampled fraction concentrates per stratum rather than globally (the
    property a per-language / per-source corpus cut needs)."""
    if not (0.0 < fraction <= 1.0):
        raise ValueError("fraction must be in (0, 1]")
    b = F.pmod(
        portable_hash60(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit("#" + salt + "#"),
                F.col(strata_col).cast("string"),
            )
        ),
        F.lit(BUCKETS),
    )
    return df.where(b < int(round(fraction * BUCKETS)))
