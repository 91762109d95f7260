"""skew report / k-anonymity / Doulion triangle estimation vs hand oracles."""

import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _g(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return LinkGraph(spark.createDataFrame(sym, "src long, dst long"))


def test_key_skew_report_hand_oracle(spark):
    """One hub key holding 6 of 10 rows → top1_share 0.6, max 6; a
    uniform second column reports top1_share 0.1."""
    from linkgraph.operators.skew import key_skew_report

    rows = [(0 if i < 6 else i, i) for i in range(10)]
    df = spark.createDataFrame(rows, "hub long, uni long")
    out = {r.key_col: r for r in key_skew_report(df, ["hub", "uni"]).collect()}
    h = out["hub"]
    assert (h.n_rows, h.n_keys, h.max_freq) == (10, 5, 6)
    assert h.top1_share == pytest.approx(0.6, abs=1e-9)
    assert h.med_freq == pytest.approx(1.0, abs=1e-9)
    u = out["uni"]
    assert (u.n_rows, u.n_keys, u.max_freq) == (10, 10, 1)
    assert u.top1_share == pytest.approx(0.1, abs=1e-9)


def test_key_skew_report_rejects_empty_cols(spark):
    from linkgraph.operators.skew import key_skew_report

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        key_skew_report(df, [])


def test_k_anonymity_flags_small_classes(spark):
    """Classes under k are at_risk=1; classes at or above k are 0."""
    from linkgraph.textops.pii import k_anonymity

    rows = [("US", "A")] * 5 + [("US", "B")] * 2 + [("FR", "A")] * 3
    df = spark.createDataFrame(rows, "nation string, seg string")
    out = {(r.nation, r.seg): r for r in k_anonymity(df, ["nation", "seg"], k=3).collect()}
    assert out[("US", "A")].group_n == 5 and out[("US", "A")].at_risk == 0
    assert out[("US", "B")].group_n == 2 and out[("US", "B")].at_risk == 1
    assert out[("FR", "A")].group_n == 3 and out[("FR", "A")].at_risk == 0


def test_k_anonymity_validates_args(spark):
    from linkgraph.textops.pii import k_anonymity

    df = spark.createDataFrame([("x",)], "q string")
    with pytest.raises(ValueError):
        k_anonymity(df, [], k=5)
    with pytest.raises(ValueError):
        k_anonymity(df, ["q"], k=0)


def test_doulion_p1_is_identity_and_symmetric(spark):
    """p=1 keeps every edge; any p keeps the sample symmetric (both
    directions of an undirected edge draw the same canonical-pair coin)."""
    from linkgraph.algos.triangles import doulion_sampled_graph

    g = _g(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)])
    full = doulion_sampled_graph(g, 1.0)
    assert full.edges.count() == g.edges.count()
    half = doulion_sampled_graph(g, 0.5)
    e = half.edges
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert e.exceptAll(rev).count() == 0  # symmetric closure preserved
    g.unpersist()


def test_doulion_deterministic_and_estimator_exact_at_p1(spark):
    """Same p → bit-identical sample across calls; triangle count on the
    p=1 sample equals the exact count (scale factor 1)."""
    from linkgraph.algos.triangles import doulion_sampled_graph, triangle_count

    g = _g(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (4, 6)])
    a = sorted(map(tuple, doulion_sampled_graph(g, 0.4).edges.collect()))
    b = sorted(map(tuple, doulion_sampled_graph(g, 0.4).edges.collect()))
    assert a == b
    assert triangle_count(doulion_sampled_graph(g, 1.0)) == triangle_count(g) == 2
    g.unpersist()


def test_doulion_rejects_bad_p(spark):
    from linkgraph.algos.triangles import doulion_sampled_graph

    g = _g(spark, [(1, 2)])
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            doulion_sampled_graph(g, bad)
    g.unpersist()
