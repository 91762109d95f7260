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
