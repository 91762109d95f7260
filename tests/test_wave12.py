"""Round-5 wave 8: KWIC, source vocab overlap, burstiness, MAD outliers."""

import pytest
from pyspark.sql import functions as F


def test_kwic_positions_and_edges(spark):
    from linkgraph.textops.retrieval import kwic_concordance

    docs = spark.createDataFrame(
        [(1, "join a b c join d"), (2, "x y z")], "doc_id long, text string"
    )
    rows = {(r["doc_id"], r["pos"]): r["context"] for r in
            kwic_concordance(docs, "join", window=2).collect()}
    # doc-start occurrence: window clipped left
    assert rows[(1, 1)] == "join a b"
    # mid occurrence at pos 5: two left, one right
    assert rows[(1, 5)] == "b c join d"
    assert not any(d == 2 for d, _ in rows)
    with pytest.raises(ValueError):
        kwic_concordance(docs, "")


def test_source_vocab_overlap_exact_jaccard(spark):
    from linkgraph.textops.textstats import source_vocab_overlap

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1", 5),
            (2, "b c d", "en", "s2", 5),
            (3, "x y", "en", "s3", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {(r["src_a"], r["src_b"]): r for r in source_vocab_overlap(docs).collect()}
    r12 = out[("s1", "s2")]
    assert (r12["vocab_a"], r12["vocab_b"], r12["n_common"]) == (3, 3, 2)
    assert r12["jac"] == pytest.approx(0.5)
    # disjoint vocabularies produce no row (inner join on common terms)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_burstiness_periodic_sequence_is_minus_one(spark):
    from linkgraph.operators.events import burstiness

    # perfectly periodic gaps -> sigma=0 -> cv=0, B=(0-mu)/(0+mu)=-1
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "a", 1.0, "") for i in range(10)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = burstiness(ev).collect()[0]
    assert r["n_gaps"] == 9
    assert r["mean_gap_s"] == pytest.approx(60.0)
    assert r["cv"] == pytest.approx(0.0)
    assert r["burstiness"] == pytest.approx(-1.0)


def test_burstiness_gaps_are_per_user_per_type(spark):
    from linkgraph.operators.events import burstiness

    # two users, one event each: no gap rows at all
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "a", 1.0, ""),
            (2, "2024-01-01 00:05:00", 2, "a", 1.0, ""),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert burstiness(ev).collect() == []


def test_mad_outliers_flags_far_point_only(spark):
    from linkgraph.operators.events import mad_outliers

    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    rows = [
        (i, "2024-01-01 00:00:00", 1, "a", v, "") for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = mad_outliers(ev).collect()[0]
    assert r["n_events"] == 6
    # median 12.5, deviations [2.5,1.5,.5,.5,1.5,987.5] -> MAD 1.5
    assert r["median_v"] == pytest.approx(12.5)
    assert r["mad_v"] == pytest.approx(1.5)
    assert r["n_outliers"] == 1
