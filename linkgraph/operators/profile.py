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


def benford_audit(events: DataFrame, round_to: int = 6) -> DataFrame:
    """Benford's-law first-digit audit of the value column, per event
    type: fabricated or unit-mangled monetary columns drift from the
    log-uniform first-digit law P(d) = log10(1 + 1/d) [Benford '38;
    Nigrini's forensic-accounting test].  Returns one row per
    (event_type, digit 1..9): observed count/share, the Benford
    expectation, and the type's chi-square statistic against it
    (missing digits contribute their full n·p term via the dense
    type×digit scaffold, so chi2 is the real statistic, not the
    observed-digit subset).

    Portability: the first significant digit comes from the INTEGER
    cents rendering (round(value·100) → string → first char) — exact on
    both engines — never floor(log10(v)), whose 1-ulp libm wobble at
    powers of ten flips the digit."""
    cents = F.round(F.col("value") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("long")
    obs = (
        events.where(F.col("value") > 0)
        .select("event_type", digit.alias("digit"))
        .groupBy("event_type", "digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_d"))
    )
    totals = obs.groupBy("event_type").agg(F.sum("n_d").cast("long").alias("n"))
    digits = events.sparkSession.range(1, 10).select(
        F.col("id").cast("long").alias("digit"),
        F.log10(1 + 1 / F.col("id").cast("double")).alias("benford_p"),
    )
    dense = (
        totals.crossJoin(F.broadcast(digits))
        .join(obs, ["event_type", "digit"], "left")
        .withColumn("n_d", F.coalesce(F.col("n_d"), F.lit(0)).cast("long"))
        .withColumn("exp_d", F.col("n") * F.col("benford_p"))
    )
    chi2 = dense.groupBy("event_type").agg(
        F.round(
            F.sum(F.pow(F.col("n_d") - F.col("exp_d"), 2) / F.col("exp_d")), round_to
        ).alias("chi2")
    )
    return dense.join(chi2, "event_type").select(
        "event_type",
        "digit",
        "n_d",
        F.round(F.col("n_d") / F.col("n"), round_to).alias("share"),
        F.round("benford_p", round_to).alias("benford_p"),
        "chi2",
    )


def population_stability(
    labeled: DataFrame, eps: float = 1e-6, round_to: int = 6
) -> DataFrame:
    """Population Stability Index between two labeled populations.

    Input: (pop, cat) rows where pop ∈ {'ref', 'cur'} tags which
    population the row belongs to and cat is any categorical (or
    pre-binned numeric) key.  Output: one row per category —
    (cat, n_ref, n_cur, psi_term) with
    psi_term = (p_cur − p_ref) · ln(p_cur / p_ref), shares clamped at
    `eps` so one-sided categories stay finite (the standard PSI
    epsilon).  Σ psi_term is the headline PSI (< 0.1 stable, > 0.25
    drifted — the usual scorecard-monitoring thresholds).

    Scale shape: one shuffle (the category rollup computes both
    population counts in a single two-lane conditional aggregate); the
    grand totals are a one-row aggregate broadcast back, so the table
    scans once and nothing driver-side touches data.
    """
    counts = labeled.groupBy("cat").agg(
        F.sum(F.when(F.col("pop") == "ref", 1).otherwise(0))
        .cast("long")
        .alias("n_ref"),
        F.sum(F.when(F.col("pop") == "cur", 1).otherwise(0))
        .cast("long")
        .alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").cast("double").alias("t_ref"),
        F.sum("n_cur").cast("double").alias("t_cur"),
    )
    p_ref = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(float(eps)))
    p_cur = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(float(eps)))
    return counts.crossJoin(F.broadcast(tot)).select(
        "cat",
        "n_ref",
        "n_cur",
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), round_to).alias("psi_term"),
    )


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group simple linear regression from ONE aggregate pass:
    (grp, n, slope, intercept, r2) via the closed-form moment identities

        slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
        r²    = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))

    — the "fit a line per segment" primitive (elasticity per brand,
    trend per source, …) that needs no ML library and shuffles ONCE on
    the group key with map-side-combined algebraic partials.  Rows with
    a NULL coordinate are dropped; degenerate groups (zero variance in
    x or y, or n < 2) return NULL fit columns rather than dividing by
    zero (ANSI-safe on both engines).
    """
    xd = F.col(x_col).cast("double")
    yd = F.col(y_col).cast("double")
    agg = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(xd).alias("sx"),
            F.sum(yd).alias("sy"),
            F.sum(xd * xd).alias("sxx"),
            F.sum(yd * yd).alias("syy"),
            F.sum(xd * yd).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    dxx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = nd * F.col("syy") - F.col("sy") * F.col("sy")
    dxy = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    ok = (F.col("n") >= 2) & (dxx > 0) & (dyy > 0)
    slope = F.when(ok, dxy / dxx).otherwise(F.lit(None).cast("double"))
    intercept = F.when(
        ok, (F.col("sy") - (dxy / dxx) * F.col("sx")) / nd
    ).otherwise(F.lit(None).cast("double"))
    r2 = F.when(ok, (dxy * dxy) / (dxx * dyy)).otherwise(
        F.lit(None).cast("double")
    )
    return agg.select(
        "grp",
        "n",
        F.round(slope, round_to).alias("slope"),
        F.round(intercept, round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
    )


def classifier_report(labeled: DataFrame, round_to: int = 6) -> DataFrame:
    """Per-class precision / recall / F1 from (truth, pred) rows — the
    eval table every labeling pipeline prints, relationally: ONE
    confusion rollup, then the class axis is assembled from three
    vocabulary-sized aggregates (row supports, column supports, and the
    diagonal) full-outer-joined, so a class that appears only in truth
    (recall 0) or only in predictions (precision 0) still gets its row.
    Zero-denominator cells are NULL (undefined), never a divide-by-zero
    on either engine; F1 is NULL unless both P and R exist and P+R > 0.
    Returns (label, n_true, n_pred, tp, precision, recall, f1).
    """
    cells = labeled.groupBy("truth", "pred").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    nt = cells.groupBy(F.col("truth").alias("label")).agg(
        F.sum("n").cast("long").alias("n_true")
    )
    npd = cells.groupBy(F.col("pred").alias("label")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    tp = cells.where(F.col("truth") == F.col("pred")).select(
        F.col("truth").alias("label"), F.col("n").alias("tp")
    )
    base = (
        nt.join(npd, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce(F.col("n_true"), F.lit(0)).cast("long").alias("n_true"),
            F.coalesce(F.col("n_pred"), F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
        )
    )
    prec = F.when(
        F.col("n_pred") > 0, F.col("tp") / F.col("n_pred").cast("double")
    ).otherwise(F.lit(None).cast("double"))
    rec = F.when(
        F.col("n_true") > 0, F.col("tp") / F.col("n_true").cast("double")
    ).otherwise(F.lit(None).cast("double"))
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        2.0 * prec * rec / (prec + rec),
    ).otherwise(F.lit(None).cast("double"))
    return base.select(
        "label",
        "n_true",
        "n_pred",
        "tp",
        F.round(prec, round_to).alias("precision"),
        F.round(rec, round_to).alias("recall"),
        F.round(f1, round_to).alias("f1"),
    )
