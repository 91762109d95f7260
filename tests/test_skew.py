"""Salted skew join (J2): identical results to the unsalted join on a
Zipf-hub graph; hub replication bounded."""

import pytest
from pyspark.sql import functions as F

from linkgraph.fixtures import transcripts_df
from linkgraph.graph import LinkGraph
from linkgraph.operators.skew import SaltedEdges
from linkgraph.sources.derive import shared_key_conv_edges


@pytest.fixture(scope="module")
def zipf_graph(spark):
    t = transcripts_df(spark, n_convs=150)
    edges = shared_key_conv_edges(t, key="tool")
    g, _ = LinkGraph.from_string_vertices(edges, "src_conv", "dst_conv", persist=False)
    return g


def test_salted_join_equals_plain(zipf_graph):
    g = zipf_graph
    frontier = g.degrees().limit(40).select(F.col("vid").alias("src"), F.lit(1).alias("tag"))
    plain = (
        g.edges.join(frontier, "src")
        .groupBy("dst")
        .agg(F.count("*").alias("n"))
        .toPandas()
        .sort_values("dst")
        .reset_index(drop=True)
    )
    salted = SaltedEdges(g, hub_threshold=10, s=4)
    got = (
        salted.join_frontier(frontier)
        .groupBy("dst")
        .agg(F.count("*").alias("n"))
        .toPandas()
        .sort_values("dst")
        .reset_index(drop=True)
    )
    assert plain.equals(got)
    salted.unpersist()


def test_kernels_on_salted_shuffle_path(spark, zipf_graph):
    """J2 integration: pagerank/msbfs through LinkGraph.expand on the
    salted SHUFFLE path (broadcast disabled) match the broadcast path."""
    import numpy as np

    from linkgraph.algos.msbfs import msbfs
    from linkgraph.algos.pagerank import pagerank

    g = zipf_graph
    srcs = g.top_degree_vids(16)
    pr_b = {r["vid"]: r["pr"] for r in pagerank(g, tol=0.0, max_iter=5).collect()}
    res_b = msbfs(g, srcs)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        g.enable_salting(hub_threshold=10, s=4)
        pr_s = {r["vid"]: r["pr"] for r in pagerank(g, tol=0.0, max_iter=5).collect()}
        res_s = msbfs(g, srcs)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        g._salted.unpersist()
        g._salted = None

    assert set(pr_b) == set(pr_s)
    assert np.allclose(
        [pr_b[v] for v in sorted(pr_b)], [pr_s[v] for v in sorted(pr_s)], atol=1e-9
    )
    assert np.array_equal(res_b.r, res_s.r) and np.array_equal(res_b.s, res_s.s)


def test_salt_spreads_hub_edges(zipf_graph):
    g = zipf_graph
    salted = SaltedEdges(g, hub_threshold=10, s=4)
    hub_salts = (
        salted.edges.join(salted.hubs, "src", "left_semi")
        .groupBy("salt")
        .count()
        .collect()
    )
    assert len(hub_salts) > 1  # hub edges span multiple salt buckets
    salted.unpersist()
