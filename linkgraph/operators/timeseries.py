"""Time-series analytics over the event/order streams: Kaplan-Meier
survival, CUSUM changepoint, autocorrelation, and frame-spec moving
aggregates.

These four close the classic "is my pipeline's activity healthy?"
questions a training-data ingest dashboard asks, and each one lowers to
a daily-rollup aggregate (one shuffle on the grouping key) followed by
window analytics over the DAY series — whose cardinality is #days, not
#events, so the ordered windows that would be a scale hazard over raw
rows are O(10^3) rows here no matter how large the event log is.  At
100 TB the only real shuffle in any of them is the first
groupBy(day[,key]), which AQE coalesces like any other rollup.

Numeric-parity notes (the mad_outliers / daily_active lessons):
* days travel as ISO strings (engines disagree on DATE dtypes);
* money sums ride integer cents (double-sum ORDER differs between
  engines; integer sums are exact), converted to dollars only at the
  projected edge;
* cumulative doubles (CUSUM, KM log-sums) are summed in the SAME
  explicit order (the day / lifetime order) on both engines, so the
  float result is bit-identical, and everything is rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    events: DataFrame, censor_days: int = 7, round_to: int = 6
) -> DataFrame:
    """Kaplan-Meier survival curve of user LIFETIMES (days between a
    user's first and last event), right-censored for users whose last
    event falls within `censor_days` of the corpus end (they may still
    be alive; treating them as churned biases S(t) down — the whole
    point of the KM estimator [Kaplan & Meier, JASA 1958]).

    Returns one row per distinct lifetime t: (t_days, n_risk, n_deaths,
    n_censored, survival) with n_risk the users whose lifetime ≥ t and
    survival = Π_{t_i ≤ t, d_i > 0} (1 − d_i / n_i), computed as
    exp(cumsum(ln factor)) with a cumulative zero-factor flag so the
    curve pins to exactly 0.0 after the last at-risk user dies (ln(0)
    is NULL on Spark and −inf on DuckDB; the flag sidesteps both).

    Plan: one groupBy(user) pass (shuffle on user_id), one tiny
    groupBy(lifetime) rollup, then ordered windows over ≤ #days rows.
    """
    per_user = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_d"),
        F.max(F.to_date("ts")).alias("last_d"),
    )
    corpus_end = events.agg(F.max(F.to_date("ts")).alias("end_d"))
    per_user = per_user.crossJoin(F.broadcast(corpus_end)).select(
        F.datediff("last_d", "first_d").cast("long").alias("t_days"),
        F.when(F.datediff("end_d", "last_d") < censor_days, 1)
        .otherwise(0)
        .alias("censored"),
    )
    grp = per_user.groupBy("t_days").agg(
        F.sum(1 - F.col("censored")).cast("long").alias("n_deaths"),
        F.sum("censored").cast("long").alias("n_censored"),
    )
    total = per_user.agg(F.count(F.lit(1)).cast("long").alias("total"))
    w = Window.orderBy("t_days")
    prior = F.coalesce(
        F.sum(F.col("n_deaths") + F.col("n_censored")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    curve = (
        grp.crossJoin(F.broadcast(total))
        .withColumn("n_risk", F.col("total") - prior)
        .withColumn(
            "factor",
            F.lit(1.0) - F.col("n_deaths") / F.col("n_risk").cast("double"),
        )
        .withColumn(
            "dead_flag",
            F.max((F.col("factor") <= 0).cast("int")).over(w),
        )
        .withColumn(
            "logsum",
            F.sum(
                F.when(F.col("factor") > 0, F.log("factor")).otherwise(0.0)
            ).over(w),
        )
    )
    return curve.select(
        "t_days",
        "n_risk",
        "n_deaths",
        "n_censored",
        F.round(
            F.when(F.col("dead_flag") == 1, 0.0).otherwise(F.exp("logsum")),
            round_to,
        ).alias("survival"),
    )


def cusum_changepoint(events: DataFrame, round_to: int = 6) -> DataFrame:
    """CUSUM changepoint scan per event type: cumulative sum of
    (daily_count − mean_daily_count) over OBSERVED days in day order;
    the day where |CUSUM| peaks is the maximum-likelihood single shift
    point for a mean change [Page, Biometrika 1954].  Returns
    (event_type, n_days, change_day, max_abs_cusum); ties break to the
    earliest day.  Days with zero events are absent from the series by
    definition (documented semantics — the oracle agrees); the CUSUM is
    summed in day order on both engines so the doubles are identical.
    """
    daily = events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wt = Window.partitionBy("event_type")
    wd = wt.orderBy("day")
    scan = (
        daily.withColumn("mu", F.avg(F.col("c").cast("double")).over(wt))
        .withColumn("n_days", F.count(F.lit(1)).over(wt))
        .withColumn("cusum", F.sum(F.col("c") - F.col("mu")).over(wd))
    )
    # rank on the ROUNDED statistic: raw doubles may differ in the last
    # ulp between engines (window-sum association order), which would
    # flip a near-tie's argmax day; at 1e-6 granularity both agree
    pick = Window.partitionBy("event_type").orderBy(
        F.round(F.abs(F.col("cusum")), round_to).desc(), F.col("day").asc()
    )
    return (
        scan.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("day").alias("change_day"),
            F.round(F.abs("cusum"), round_to).alias("max_abs_cusum"),
        )
    )


def acf_daily(
    events: DataFrame, max_lag: int = 7, round_to: int = 6
) -> DataFrame:
    """Autocorrelation of the TOTAL daily event-count series at lags
    1..max_lag: r_k = Σ(y_t−ȳ)(y_{t+k}−ȳ) / Σ(y_t−ȳ)², the standard
    biased ACF (constant denominator over the full series).  Detects
    weekly periodicity in ingest volume — the r_7 spike every
    production event log shows.  Returns (lag, n_pairs, acf).

    Plan: one day rollup, then a lag self-join on calendar date
    arithmetic (date_add) — the series has #days rows, so the join is
    trivially broadcastable and the lags explode to max_lag·#days rows.
    Calendar gaps (days with zero events) simply contribute no pair.
    """
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    # two-pass: ybar first, then centered residuals (window-in-agg is illegal)
    stats = daily.agg(F.avg("y").alias("ybar"))
    centered = daily.crossJoin(F.broadcast(stats)).select(
        "d", (F.col("y") - F.col("ybar")).alias("e")
    )
    denom = centered.agg(F.sum(F.col("e") * F.col("e")).alias("den"))
    lags = centered.select(
        "d", "e", F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    ).select("e", "lag", F.date_add("d", F.col("lag")).alias("d2"))
    pairs = lags.join(
        centered.select(F.col("d").alias("d2"), F.col("e").alias("e2")), "d2"
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("e") * F.col("e2")).alias("num"),
        )
        .crossJoin(F.broadcast(denom))
        .select(
            F.col("lag").cast("long").alias("lag"),
            "n_pairs",
            F.round(F.col("num") / F.col("den"), round_to).alias("acf"),
        )
    )


def moving_stats(
    orders: DataFrame, window_rows: int = 7, round_to: int = 6
) -> DataFrame:
    """Daily revenue with a `window_rows`-row moving average and a
    running cumulative total — the frame-spec analytic (ROWS BETWEEN
    k PRECEDING AND CURRENT ROW) SURVEY §2.5/W3 lists.  Returns
    (day, revenue, ma, cum_revenue).

    Money rides integer cents end-to-end (double-sum order differs
    between engines; bigint sums are exact) and becomes dollars only in
    the final projection, so the hash-compare is exact.  The ordered
    windows run over the DAY rollup (#days rows), not raw orders — the
    one real shuffle is the groupBy(day).
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(cents).alias("rev_c"))
    w = Window.orderBy("day")
    ma = F.avg(F.col("rev_c").cast("double")).over(
        w.rowsBetween(-(window_rows - 1), 0)
    )
    cum = F.sum("rev_c").over(w)
    return daily.select(
        "day",
        F.round(F.col("rev_c") / 100.0, round_to).alias("revenue"),
        F.round(ma / 100.0, round_to).alias("ma"),
        F.round(cum / 100.0, round_to).alias("cum_revenue"),
    )


def seasonal_anomalies(
    events: DataFrame, z_cut: float = 2.0, round_to: int = 6
) -> DataFrame:
    """Weekday-adjusted anomalous days: each day's total event count is
    z-scored against the mean/σ of ITS OWN weekday (Mondays compare to
    Mondays), so weekly seasonality never masquerades as an anomaly —
    the readout cusum_changepoint (level shifts) does not give.
    Returns days with |z| > z_cut: (day, weekday, c, mu_wd, sd_wd, z).

    Weekday comes from epoch-day arithmetic ((days_since_epoch + 3) % 7,
    0 = Monday) — engines disagree on dayofweek() numbering, integer
    arithmetic they cannot.  Same day-rollup plan as the other series
    ops: one corpus shuffle, then windows over #days rows; the z filter
    compares the ROUNDED score so the cut cannot flip on σ's last ulp.
    """
    daily = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("dd"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wd = daily.select(
        "day", ((F.col("dd") + 3) % 7).cast("long").alias("weekday"), "c"
    )
    w = Window.partitionBy("weekday")
    scored = (
        wd.withColumn("mu_wd", F.avg(F.col("c").cast("double")).over(w))
        .withColumn("sd_wd", F.stddev_samp(F.col("c").cast("double")).over(w))
        .withColumn(
            "z", F.round((F.col("c") - F.col("mu_wd")) / F.col("sd_wd"), round_to)
        )
    )
    return scored.where(
        F.col("sd_wd").isNotNull()
        & (F.col("sd_wd") > 0)
        & (F.abs(F.col("z")) > z_cut)
    ).select(
        "day",
        "weekday",
        "c",
        F.round("mu_wd", round_to).alias("mu_wd"),
        F.round("sd_wd", round_to).alias("sd_wd"),
        "z",
    )


def ewma_control(
    events: DataFrame,
    alpha: float = 0.5,
    limit_l: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """EWMA control chart [Roberts, Technometrics 1959] per event type
    over the observed daily-count series: s_t = α·x_t + (1−α)·s_{t−1}
    with s_0 = the series mean, flagged when s_t leaves
    μ ± L·σ·sqrt(α/(2−α)·(1−(1−α)^{2t})) (the exact finite-t variance
    inflation, not the asymptotic band).  Returns one row per
    (event_type, day): (day, n_events, ewma, lcl, ucl, flag).

    The recurrence lowers to the closed form
    s_t = (1−α)^t·μ + α·Σ_{i≤t} (1−α)^{t−i}·x_i, computed with a
    day-index self-join over the per-type DAY series — quadratic in
    #days, but the corpus already collapsed to the daily rollup, so
    the join is O(#types·#days²) rows regardless of event volume (the
    module-header scale posture).  Default α = 0.5 keeps every decay
    weight an EXACT binary power, so pow() is exact on both engines and
    the chart carries zero libm wobble (the floor(log10) lesson from
    benford_audit); the out-of-band verdict compares ROUNDED statistic
    against ROUNDED limits so the cut is engine-stable.
    """
    a = float(alpha)
    b = 1.0 - a
    daily = events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wt = Window.partitionBy("event_type")
    idx = (
        daily.withColumn("t", F.row_number().over(wt.orderBy("day")))
        .withColumn("mu", F.avg(F.col("c").cast("double")).over(wt))
        .withColumn("sig", F.stddev_pop(F.col("c").cast("double")).over(wt))
    )
    lhs = idx.select(
        "event_type", "day", "c", "t", "mu", "sig"
    )
    rhs = idx.select(
        F.col("event_type").alias("et2"),
        F.col("t").alias("i"),
        F.col("c").alias("ci"),
    )
    ws = (
        lhs.join(
            rhs,
            (lhs["event_type"] == rhs["et2"]) & (rhs["i"] <= lhs["t"]),
        )
        .groupBy("event_type", "day", "c", "t", "mu", "sig")
        .agg(
            F.sum(
                F.pow(F.lit(b), F.col("t") - F.col("i")) * F.col("ci")
            ).alias("wsum")
        )
    )
    s = F.round(
        F.lit(a) * F.col("wsum") + F.pow(F.lit(b), F.col("t")) * F.col("mu"),
        round_to,
    )
    half = (
        F.lit(float(limit_l))
        * F.col("sig")
        * F.sqrt(F.lit(a / (2.0 - a)) * (1.0 - F.pow(F.lit(b), 2 * F.col("t"))))
    )
    lcl = F.round(F.col("mu") - half, round_to)
    ucl = F.round(F.col("mu") + half, round_to)
    return ws.select(
        "event_type",
        "day",
        F.col("c").alias("n_events"),
        s.alias("ewma"),
        lcl.alias("lcl"),
        ucl.alias("ucl"),
        F.when((s > ucl) | (s < lcl), 1).otherwise(0).cast("int").alias("flag"),
    )
