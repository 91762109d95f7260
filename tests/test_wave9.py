"""Round-5 wave 5: interval union, decayed activity, Markov stationary,
Heaps'-law fit."""

import math

import pytest
from pyspark.sql import functions as F


# -------------------------------------------------------------- interval union
def test_interval_union_merges_overlaps_and_touches(spark):
    from linkgraph.operators.intervals import interval_union

    iv = spark.createDataFrame(
        [
            # key 1: [0,10] + [5,20] overlap -> [0,20]; [20,30] touches -> [0,30];
            # [40,45] separate
            (1, 0, 10, 1),
            (1, 5, 20, 2),
            (1, 20, 30, 3),
            (1, 40, 45, 4),
            # key 2: containment [0,100] swallows [10,20]
            (2, 0, 100, 5),
            (2, 10, 20, 6),
        ],
        "user_id long, start_s long, end_s long, event_id long",
    )
    out = {r["user_id"]: r for r in interval_union(iv).collect()}
    assert (
        out[1]["n_blocks"],
        out[1]["covered_s"],
        out[1]["max_block_s"],
    ) == (2, 35, 30)
    assert (
        out[2]["n_blocks"],
        out[2]["covered_s"],
        out[2]["max_block_s"],
    ) == (1, 100, 100)


def test_interval_union_containment_then_gap(spark):
    from linkgraph.operators.intervals import interval_union

    # [0,50] contains [10,15]; [30,40] also inside; then gap; running-max
    # logic must not reopen a block at start=30 < max_end=50
    iv = spark.createDataFrame(
        [(1, 0, 50, 1), (1, 10, 15, 2), (1, 30, 40, 3), (1, 60, 70, 4)],
        "user_id long, start_s long, end_s long, event_id long",
    )
    r = interval_union(iv).collect()[0]
    assert (r["n_blocks"], r["covered_s"], r["max_block_s"]) == (2, 60, 50)


# ------------------------------------------------------------ decayed activity
def test_decayed_activity_half_life_math(spark):
    from linkgraph.operators.events import decayed_activity

    ev = spark.createDataFrame(
        [
            (1, "2024-01-02 00:00:00", 1, "a", 8.0, ""),
            (2, "2024-01-01 00:00:00", 1, "a", 8.0, ""),  # one half-life older
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = decayed_activity(ev, half_life_s=86_400).collect()[0]
    # anchor = newest ts: 8*2^0 + 8*2^-1 = 12
    assert r["n_events"] == 2
    assert r["decayed_score"] == pytest.approx(12.0)


# ---------------------------------------------------------- Markov stationary
def test_event_stationary_two_state_chain(spark):
    from linkgraph.operators.events import event_stationary

    # one user, alternating A B A B A -> P(A->B)=1, P(B->A)=1: period-2
    # chain; uniform init is already stationary (0.5, 0.5)
    rows = [
        (i, f"2024-01-01 00:00:{i:02d}", 1, t, 1.0, "")
        for i, t in enumerate(["A", "B", "A", "B", "A"])
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_type"]: r["pi"] for r in event_stationary(ev, iters=4).collect()}
    assert out["A"] == pytest.approx(0.5) and out["B"] == pytest.approx(0.5)


def test_event_stationary_sink_self_loop_conserves_mass(spark):
    from linkgraph.operators.events import event_stationary

    # A -> B, B never transitions (sink): all mass ends in B
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "A", 1.0, ""),
            (2, "2024-01-01 00:00:01", 1, "B", 1.0, ""),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_type"]: r["pi"] for r in event_stationary(ev, iters=10).collect()}
    assert out["B"] == pytest.approx(1.0)
    assert out.get("A", 0.0) == pytest.approx(0.0, abs=1e-9)


# ------------------------------------------------------------------ Heaps' law
def test_heaps_fit_known_slope(spark):
    from linkgraph.textops.textstats import heaps_fit

    # vocabulary doubles as tokens double: V = t/2 exactly -> beta = 1
    docs = spark.createDataFrame(
        [(1, "a a b b"), (2, "c c d d"), (3, "e e f f")],
        "doc_id long, text string",
    )
    r = heaps_fit(docs).collect()[0]
    assert (r["n_docs"], r["total_tokens"], r["vocab"]) == (3, 12, 6)
    assert r["heaps_beta"] == pytest.approx(1.0)


def test_heaps_fit_saturated_vocab_slope_zero(spark):
    from linkgraph.textops.textstats import heaps_fit

    # same vocab in every doc: V(t) constant after doc 1 -> beta near 0
    docs = spark.createDataFrame(
        [(i, "x y z") for i in range(1, 9)], "doc_id long, text string"
    )
    r = heaps_fit(docs).collect()[0]
    assert r["vocab"] == 3
    assert abs(r["heaps_beta"]) < 0.2


def test_heaps_fit_skips_leading_empty_docs(spark):
    from linkgraph.textops.textstats import heaps_fit

    docs = spark.createDataFrame(
        [(1, ""), (2, "a b"), (3, "c d")], "doc_id long, text string"
    )
    r = heaps_fit(docs).collect()[0]
    # doc 1 contributes no checkpoint (ln guard), docs 2-3 do
    assert r["n_docs"] == 2 and r["total_tokens"] == 4 and r["vocab"] == 4
