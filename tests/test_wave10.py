"""Round-5 wave 6: TPC-H classic forms and CUPED A/B."""

import pytest
from pyspark.sql import functions as F


def test_cuped_theta_and_adjustment(spark):
    from linkgraph.operators.events import cuped_ab_test

    # users with pre perfectly predicting post (post = 2*pre):
    # theta = cov/var = 2, every adjusted value collapses to the
    # same number -> mean_adj identical across groups
    rows = []
    eid = 0
    for u in range(1, 21):
        pre_v = float(u)
        rows.append((eid, "2024-01-01 00:00:00", u, "a", pre_v, ""))
        eid += 1
        rows.append((eid, "2024-01-03 00:00:00", u, "a", 2 * pre_v, ""))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["grp"]: r for r in cuped_ab_test(ev).collect()}
    assert set(out) == {"A", "B"}
    assert sum(r["n_users"] for r in out.values()) == 20
    for r in out.values():
        assert r["theta"] == pytest.approx(2.0)
    # perfectly-correlated covariate: adjusted means equal across groups
    assert out["A"]["mean_adj"] == pytest.approx(out["B"]["mean_adj"])
    # raw means differ between groups on this fixture (hash split of a
    # linear ramp), so the adjustment is doing real work
    assert out["A"]["mean_post"] != pytest.approx(out["B"]["mean_post"])


def test_pricing_summary_shape_and_totals(spark, sf0001):
    from linkgraph.entry_queries import q_pricing_summary

    rows = q_pricing_summary(spark, sf0001).collect()
    assert rows
    li = spark.read.parquet(f"{sf0001}/lineitem.parquet")
    expect = li.where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).count()
    assert sum(r["count_order"] for r in rows) == expect
    for r in rows:
        assert r["sum_disc_price"] <= r["sum_base_price"]
        assert r["sum_charge"] >= r["sum_disc_price"]


def test_shipping_priority_is_top10_sorted(spark, sf0001):
    from linkgraph.entry_queries import q_shipping_priority

    rows = q_shipping_priority(spark, sf0001).collect()
    assert 0 < len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_revenue_simple_matches_manual_filter(spark, sf0001):
    from linkgraph.entry_queries import q_revenue_simple

    r = q_revenue_simple(spark, sf0001).collect()[0]
    li = spark.read.parquet(f"{sf0001}/lineitem.parquet")
    manual = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).count()
    assert r["n_items"] == manual
    assert (r["revenue"] or 0.0) >= 0.0


def test_revenue_simple_pushes_filters_to_scan(spark, sf0001):
    from linkgraph.entry_queries import q_revenue_simple

    plan = q_revenue_simple(spark, sf0001)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # the shipdate range must reach the parquet reader, not sit in a
    # post-scan Filter only
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_did_estimate_recovers_planted_effect(spark):
    import hashlib

    from linkgraph.operators.events import did_estimate

    def grp(u):
        h = int(hashlib.md5(f"{u}#did".encode()).hexdigest()[:15], 16)
        return "T" if h % 2 == 0 else "C"

    # every user: pre value 10 at day 1, post value 20 at day 9 (common
    # trend +10); treated users get +5 extra post -> did = +5 exactly
    rows, eid = [], 0
    users = list(range(1, 13))
    for u in users:
        rows.append((eid, "2024-01-01 00:00:00", u, "a", 10.0, ""))
        eid += 1
        post = 25.0 if grp(u) == "T" else 20.0
        rows.append((eid, "2024-01-09 00:00:00", u, "a", post, ""))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = did_estimate(ev).collect()
    assert len(out) == 1
    r = out[0]
    n_t = sum(1 for u in users if grp(u) == "T")
    assert (r.n_treat, r.n_ctrl) == (n_t, len(users) - n_t)
    assert r.pre_treat == pytest.approx(10.0) and r.pre_ctrl == pytest.approx(10.0)
    assert r.post_treat == pytest.approx(25.0)
    assert r.post_ctrl == pytest.approx(20.0)
    assert r.did == pytest.approx(5.0)


def test_retention_lift_separating_score(spark):
    from linkgraph.operators.events import retention_lift

    # users 1-10: high pre spend AND post activity; users 11-20: low
    # pre spend, churned -> with 2 buckets the curve separates exactly
    rows, eid = [], 0
    for u in range(1, 11):
        rows.append((eid, "2024-01-01 00:00:00", u, "a", 10.0 * u, ""))
        eid += 1
        rows.append((eid, "2024-01-09 00:00:00", u, "a", 1.0, ""))
        eid += 1
    for u in range(11, 21):
        rows.append((eid, "2024-01-01 00:00:00", u, "a", 1.0, ""))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.bucket: r for r in retention_lift(ev, n_buckets=2).collect()}
    assert set(got) == {1, 2}
    assert (got[1].n_users, got[1].n_retained) == (10, 10)
    assert (got[2].n_users, got[2].n_retained) == (10, 0)
    assert got[1].retain_rate == pytest.approx(1.0)
    assert got[1].cum_lift == pytest.approx(2.0)  # top bucket doubles base
    assert got[2].cum_lift == pytest.approx(1.0)  # full population = base


def test_covariate_balance_flags_planted_imbalance(spark):
    import hashlib

    from linkgraph.operators.events import covariate_balance

    def grp(u):
        h = int(hashlib.md5(f"{u}#did".encode()).hexdigest()[:15], 16)
        return "T" if h % 2 == 0 else "C"

    # pre_value: treated users planted 3x higher (imbalanced);
    # pre_events/pre_days identical across arms (balanced, smd = 0)
    rows, eid = [], 0
    users = list(range(1, 17))
    for u in users:
        v = 30.0 if grp(u) == "T" else 10.0
        rows.append((eid, "2024-01-01 00:00:00", u, "a", v + u * 1e-3, ""))
        eid += 1
        rows.append((eid, "2024-01-09 00:00:00", u, "a", 1.0, ""))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.covariate: r for r in covariate_balance(ev).collect()}
    assert set(got) == {"pre_value", "pre_events", "pre_days"}
    assert got["pre_value"].imbalanced == 1 and got["pre_value"].smd > 1.0
    assert got["pre_events"].smd == pytest.approx(0.0, abs=1e-6)
    assert got["pre_events"].imbalanced == 0
    assert got["pre_days"].imbalanced == 0
    assert got["pre_value"].mean_treat > got["pre_value"].mean_ctrl


def test_poisson_bootstrap_deterministic_and_calibrated(spark):
    from linkgraph.operators.events import poisson_bootstrap_mean

    rows = []
    for u in range(1, 41):
        rows.append((u, "2024-01-01 00:00:00", u, "a", float(u), ""))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r1 = poisson_bootstrap_mean(ev, b=60).collect()[0]
    r2 = poisson_bootstrap_mean(ev, b=60).collect()[0]
    assert r1 == r2  # hash-derived draws: no RNG, bit-stable reruns
    assert r1.n_users == 40 and r1.n_reps == 60
    assert r1.est == pytest.approx(20.5)
    assert r1.ci_lo < r1.est < r1.ci_hi
    # analytic SE of the mean is sd/sqrt(n) ~ 1.83; the Poisson
    # bootstrap should land in the right ballpark, not a decade off
    import statistics

    se = statistics.pstdev(range(1, 41)) / (40**0.5)
    assert 0.3 * se < r1.boot_se < 3.0 * se
