"""operators/timeseries.py vs hand-computed oracles on tiny fixtures."""

from datetime import date, datetime

import pytest


def _events(spark, rows):
    # (event_id, ts, user_id, event_type)
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_kaplan_meier_hand_computed(spark):
    from linkgraph.operators.timeseries import kaplan_meier

    d = lambda day: datetime(2026, 1, day)
    rows = [
        (0, d(1), 1, "x"), (1, d(10), 1, "x"),   # t=9, death
        (2, d(1), 2, "x"),                        # t=0, death
        (3, d(2), 3, "x"), (4, d(28), 3, "x"),    # t=26, censored (31-28<7)
        (5, d(5), 4, "x"), (6, d(14), 4, "x"),    # t=9, death
        (7, d(1), 5, "x"), (8, d(31), 5, "x"),    # t=30, censored (corpus end)
    ]
    got = {
        r.t_days: (r.n_risk, r.n_deaths, r.n_censored, r.survival)
        for r in kaplan_meier(_events(spark, rows), censor_days=7).collect()
    }
    assert got == {
        0: (5, 1, 0, 0.8),
        9: (4, 2, 0, 0.4),
        26: (2, 0, 1, 0.4),
        30: (1, 0, 1, 0.4),
    }


def test_kaplan_meier_pins_to_zero_after_last_death(spark):
    from linkgraph.operators.timeseries import kaplan_meier

    d = lambda day: datetime(2026, 1, day)
    # both users die (well before corpus end): survival must reach 0.0
    rows = [
        (0, d(1), 1, "x"), (1, d(2), 1, "x"),    # t=1
        (2, d(1), 2, "x"), (3, d(3), 2, "x"),    # t=2
        (4, d(1), 3, "x"), (5, d(31), 3, "x"),   # censored keeps corpus open
    ]
    out = {r.t_days: r.survival for r in
           kaplan_meier(_events(spark, rows), censor_days=7).collect()}
    assert out[1] == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert out[2] == pytest.approx(1.0 / 3.0, abs=1e-6)
    assert out[30] == pytest.approx(1.0 / 3.0, abs=1e-6)


def test_cusum_changepoint_tie_breaks_earliest(spark):
    from linkgraph.operators.timeseries import cusum_changepoint

    d = lambda day, i: datetime(2026, 1, day, 0, i)
    rows = []
    eid = 0
    for day, n in [(1, 3), (2, 1), (3, 1), (4, 3)]:  # mu=2, cusum 1,0,-1,0
        for i in range(n):
            rows.append((eid, d(day, i), 1, "x"))
            eid += 1
    out = cusum_changepoint(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.event_type, r.n_days, r.change_day, r.max_abs_cusum) == (
        "x", 4, "2026-01-01", 1.0,
    )


def test_acf_daily_hand_computed(spark):
    from linkgraph.operators.timeseries import acf_daily

    d = lambda day, i: datetime(2026, 1, day, 0, i)
    rows = []
    eid = 0
    for day, n in [(1, 1), (2, 2), (3, 3), (4, 2), (5, 1)]:
        for i in range(n):
            rows.append((eid, d(day, i), 1, "x"))
            eid += 1
    got = {r.lag: (r.n_pairs, r.acf) for r in
           acf_daily(_events(spark, rows), max_lag=7).collect()}
    # series [1,2,3,2,1], ybar=1.8, den=2.8
    assert got[1] == (4, pytest.approx(0.16 / 2.8, abs=1e-6))
    assert got[2] == (3, pytest.approx(-1.88 / 2.8, abs=1e-6))
    assert got[4] == (1, pytest.approx(0.64 / 2.8, abs=1e-6))
    assert 5 not in got and 7 not in got  # no pairs -> no row


def test_moving_stats_frame_and_cumulative(spark):
    from linkgraph.operators.timeseries import moving_stats

    orders = spark.createDataFrame(
        [
            (1, date(2026, 1, 1), 10.00),
            (2, date(2026, 1, 1), 5.25),
            (3, date(2026, 1, 2), 4.75),
            (4, date(2026, 1, 3), 10.00),
        ],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    )
    got = {r.day: (r.revenue, r.ma, r.cum_revenue) for r in
           moving_stats(orders, window_rows=2).collect()}
    assert got == {
        "2026-01-01": (15.25, 15.25, 15.25),
        "2026-01-02": (4.75, 10.0, 20.0),
        "2026-01-03": (10.0, 7.375, 30.0),
    }


def test_peak_hour_load_range_frame(spark):
    from linkgraph.operators.events import peak_hour_load

    base = datetime(2026, 1, 1)
    rows = [
        # user 1: events at +0s, +100s, +3599s, +3600s -> peak 3,
        # tie between windows closing at 3599 and 3600 -> earliest
        (0, base, 1, "x"),
        (1, datetime(2026, 1, 1, 0, 1, 40), 1, "x"),
        (2, datetime(2026, 1, 1, 0, 59, 59), 1, "x"),
        (3, datetime(2026, 1, 1, 1, 0, 0), 1, "x"),
        # user 2: single event -> peak 1
        (4, base, 2, "x"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r.user_id: (r.peak_n, r.peak_ep) for r in
           peak_hour_load(df, window_s=3600).collect()}
    base_ep = int(base.timestamp())
    assert got[1] == (3, base_ep + 3599)
    assert got[2] == (1, base_ep)


def test_eb_smoothed_rates_shrink_toward_global(spark):
    import pytest as _pt

    from linkgraph.textops.textstats import eb_smoothed_long_doc_rates

    rows = [("A", 300)] * 3 + [("B", 300)] * 2 + [("B", 1)] * 8
    docs = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r.source: r for r in
           eb_smoothed_long_doc_rates(docs, prior_strength=20.0).collect()}
    g = 5.0 / 13.0
    assert got["A"].raw_rate == 1.0
    assert got["B"].raw_rate == _pt.approx(0.2)
    assert got["A"].smoothed_rate == _pt.approx((3 + 20 * g) / 23.0, abs=1e-6)
    assert got["B"].smoothed_rate == _pt.approx((2 + 20 * g) / 30.0, abs=1e-6)
    # shrinkage pulls the tiny all-long source DOWN and the big source UP
    assert got["A"].smoothed_rate < got["A"].raw_rate
    assert got["B"].smoothed_rate > got["B"].raw_rate


def test_seasonal_anomalies_weekday_adjusted(spark):
    from linkgraph.operators.timeseries import seasonal_anomalies

    # Jan 2026: 1st = Thursday. Mondays (5,12,19,26) carry 10 events
    # except the 26th carries 30 (the anomaly); all other days carry 10.
    # A plain z-score would flag nothing special about Mondays; the
    # weekday baseline isolates the 26th.
    rows, eid = [], 0
    for day in range(1, 29):
        n = 30 if day == 26 else 10
        for i in range(n):
            rows.append((eid, datetime(2026, 1, day, 0, i % 60, i // 60), 1, "x"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = seasonal_anomalies(df, z_cut=1.4).collect()
    assert [r.day for r in out] == ["2026-01-26"]
    r = out[0]
    assert r.weekday == 0 and r.c == 30  # Monday
    assert r.mu_wd == 15.0  # (10+10+10+30)/4
    assert r.z > 1.4


def test_source_kl_zero_for_identical_sources(spark):
    import pytest as _pt

    from linkgraph.textops.textstats import source_kl_divergence

    # two sources with IDENTICAL token distributions: KL reduces to the
    # smoothing floor (P_s != Q only through add-1), tiny and equal;
    # a third source with disjoint vocabulary scores far higher
    docs = spark.createDataFrame(
        [
            (0, "A", "alpha beta alpha beta"),
            (1, "B", "alpha beta alpha beta"),
            (2, "C", "gamma delta gamma delta"),
        ],
        "doc_id long, source string, text string",
    )
    got = {r.source: r for r in source_kl_divergence(docs).collect()}
    assert got["A"].kl == _pt.approx(got["B"].kl, abs=1e-9)
    assert got["C"].kl > got["A"].kl * 2
    assert got["A"].vocab_hits == 2 and got["C"].vocab_hits == 2
    assert got["A"].n_tokens == 4


def test_strength_disparity_extremes(spark):
    import pytest as _pt

    from linkgraph.algos.gstats import strength_disparity

    # vertex 1: weight spread evenly over 4 neighbors -> Y = 1/4, k_eff 4
    # vertex 2: one dominant tie (97 of 100) -> Y near 1, k_eff near 1
    rows = [(1, 10 + j, 5) for j in range(4)]
    rows += [(2, 20, 97), (2, 21, 1), (2, 22, 1), (2, 23, 1)]
    we = spark.createDataFrame(rows, "src long, dst long, w long")
    got = {r.vid: r for r in strength_disparity(we).collect()}
    assert got[1].deg == 4 and got[1].strength == 20
    assert got[1].disparity == _pt.approx(0.25, abs=1e-6)
    assert got[1].k_eff == _pt.approx(4.0, abs=1e-6)
    assert got[2].disparity == _pt.approx((97**2 + 3) / 100.0**2, abs=1e-6)
    assert got[2].k_eff < 1.1


def test_tie_strength_overlap_curve(spark):
    import pytest as _pt

    from linkgraph.algos.gstats import tie_strength_overlap

    # triangle {1,2,3} with a doubled 1-2 tie, a tripled bridge 3-4,
    # pendant 4-5, and an isolated dyad 6-7 (zero-denominator guard)
    rows = [(1, 2), (2, 1), (1, 3), (2, 3), (3, 4), (3, 4), (4, 3), (4, 5), (6, 7)]
    de = spark.createDataFrame(rows, "src long, dst long")
    got = {r.w: r for r in tie_strength_overlap(de).collect()}
    # w=1: (1,3) jac 1/2, (2,3) jac 1/2, (4,5) jac 0, (6,7) denom 0 -> 0
    assert got[1].n_ties == 4
    assert got[1].mean_jaccard == _pt.approx(0.25, abs=1e-6)
    # w=2: (1,2) shares {3}; union\{1,2}={3} -> jaccard 1.0
    assert got[2].n_ties == 1
    assert got[2].mean_jaccard == _pt.approx(1.0, abs=1e-6)
    # w=3: bridge (3,4), no common neighbors -> 0
    assert got[3].n_ties == 1
    assert got[3].mean_jaccard == _pt.approx(0.0, abs=1e-6)


def test_cohort_ltv_accumulates_per_fixed_cohort_size(spark):
    import pytest as _pt

    from linkgraph.operators.events import cohort_ltv

    orders = spark.createDataFrame(
        [
            # cohort 2026-01: two customers
            (1, 100, date(2026, 1, 5), 10.00),
            (2, 101, date(2026, 1, 20), 30.00),
            # month offset 1: only customer 100 returns
            (3, 100, date(2026, 2, 2), 20.00),
            # cohort 2026-02: one customer
            (4, 102, date(2026, 2, 10), 50.00),
        ],
        "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double",
    )
    got = {(r.cohort_month, r.month_offset): r for r in cohort_ltv(orders).collect()}
    r0 = got[("2026-01", 0)]
    assert r0.n_customers == 2 and r0.revenue == 40.0
    assert r0.cum_revenue_per_cust == _pt.approx(20.0)
    r1 = got[("2026-01", 1)]
    assert r1.revenue == 20.0
    # cumulative divides by the FIXED cohort size (2), not active users
    assert r1.cum_revenue_per_cust == _pt.approx(30.0)
    assert got[("2026-02", 0)].cum_revenue_per_cust == _pt.approx(50.0)


def test_triadic_closure_rate_strict_after_and_hub_cap(spark):
    import pytest as _pt

    from linkgraph.algos.linkpred import triadic_closure_rate

    E = [
        # wedge 1->2->3 forms 2024-01, closed by (1,3) in Feb
        (1, 2, date(2024, 1, 5)),
        (2, 3, date(2024, 1, 10)),
        (1, 3, date(2024, 2, 1)),
        # wedge 4->5->6 forms 2024-03, never closed
        (4, 5, date(2024, 1, 20)),
        (5, 6, date(2024, 3, 15)),
        # wedge 7->8->9 forms 2024-02 but (7,9) predates it -> NOT closed
        (7, 8, date(2024, 2, 10)),
        (8, 9, date(2024, 2, 20)),
        (7, 9, date(2024, 2, 1)),
    ]
    te = spark.createDataFrame(E, "src long, dst long, t date")
    got = {r.month: r for r in triadic_closure_rate(te).collect()}
    assert got["2024-01"].n_wedges == 1 and got["2024-01"].n_closed == 1
    assert got["2024-01"].closure_rate == _pt.approx(1.0, abs=1e-6)
    assert got["2024-02"].n_wedges == 1 and got["2024-02"].n_closed == 0
    assert got["2024-03"].n_wedges == 1 and got["2024-03"].n_closed == 0
    # hub cap: center 2 has total degree 2 (in 1, out 1); cap 1 removes
    # the January wedge entirely
    capped = {r.month for r in triadic_closure_rate(te, hub_cap=1).collect()}
    assert "2024-01" not in capped


def test_ewma_control_chart_flags_spike(spark):
    import pytest as _pt

    from linkgraph.operators.timeseries import ewma_control

    # 7 flat days then a 4x spike; L=1 band so the in-sample-inflated
    # sigma still lets the spike day flag
    counts = [10] * 7 + [40]
    rows, eid = [], 0
    for day, n in enumerate(counts, 1):
        for i in range(n):
            rows.append((eid, datetime(2026, 1, day, 0, i % 60, i // 60), 1, "x"))
            eid += 1
    got = sorted(
        ewma_control(_events(spark, rows), limit_l=1.0).collect(),
        key=lambda r: r.day,
    )
    # the closed form must equal the textbook recurrence seeded at mu
    mu = sum(counts) / len(counts)
    s, exp = mu, []
    for x in counts:
        s = 0.5 * x + 0.5 * s
        exp.append(s)
    for r, e in zip(got, exp):
        assert r.ewma == _pt.approx(e, abs=1e-6)
    assert [r.flag for r in got] == [0] * 7 + [1]
    # finite-t variance inflation: the band widens monotonically
    ucls = [r.ucl for r in got]
    assert all(ucls[i] <= ucls[i + 1] + 1e-9 for i in range(len(ucls) - 1))


def test_ks_drift_one_vs_rest(spark):
    import pytest as _pt

    from linkgraph.textops.textstats import ks_drift

    # A and B share lengths 1..10; C sits at 101..110 (fully shifted)
    rows = []
    did = 0
    for src, base in (("A", 0), ("B", 0), ("C", 100)):
        for i in range(1, 11):
            rows.append((did, "t", "en", src, base + i))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.source: r for r in ks_drift(docs).collect()}
    crit = 1.358 * (30 / (10 * 20)) ** 0.5
    # C vs rest: total separation -> D = 1.0 at the rest's last mass point
    assert got["C"].ks == _pt.approx(1.0, abs=1e-6)
    assert got["C"].at_len == 10 and got["C"].drifted == 1
    # A vs rest (B identical, C shifted): D = 0.5, under the critical value
    assert got["A"].ks == _pt.approx(0.5, abs=1e-6)
    assert got["A"].drifted == 0
    assert got["A"].crit == _pt.approx(crit, abs=1e-5)
    assert got["B"].ks == got["A"].ks
