"""Edge derivation from transcripts (S7/S8) + the per-turn text-equality
invariant (BASELINE input_hint) verified end-to-end."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.fixtures import make_transcripts, transcripts_df
from linkgraph.graph import LinkGraph
from linkgraph.sources.derive import (
    shared_key_conv_edges,
    stable_turn_order,
    turn_adjacency_edges,
)


@pytest.fixture(scope="module")
def tdf(spark):
    return transcripts_df(spark, n_convs=120).cache()


def test_shared_tool_edges_vs_pandas(tdf):
    got = {
        (r["src_conv"], r["dst_conv"])
        for r in shared_key_conv_edges(tdf, key="tool").collect()
    }
    pdf = make_transcripts(120)
    ck = pdf[pdf.tool.notna()][["conv_id", "tool"]].drop_duplicates()
    exp = set()
    by_tool = ck.groupby("tool")["conv_id"].apply(list)
    for convs in by_tool:
        convs = sorted(set(convs))
        for i, a in enumerate(convs):
            for b in convs[i + 1 :]:
                exp.add((a, b))
    assert got == exp


def test_shared_actor_edges(tdf):
    got = shared_key_conv_edges(tdf, key="role").count()
    assert got > 0


def test_hub_cap_drops_quadratic_keys(tdf):
    full = shared_key_conv_edges(tdf, key="tool").count()
    capped = shared_key_conv_edges(tdf, key="tool", hub_cap=5).count()
    assert capped < full


def test_turn_adjacency_is_path_per_conv(tdf, spark):
    e = turn_adjacency_edges(tdf)
    pdf = e.toPandas()
    one = pdf[pdf.conv_id == "c00000005"].sort_values("src_turn")
    # a conv with T turns yields a path of T-1 adjacency edges
    n_turns = make_transcripts(120).query("conv_id == 'c00000005'").shape[0]
    assert len(one) == n_turns - 1
    assert one["dst_turn"].tolist() == (one["src_turn"] + 1).tolist()


def test_turn_adjacency_bfs_distance_is_turn_delta(tdf, spark):
    """BFS over the turn-adjacency graph: dist((c,0) -> (c,k)) == k."""
    from linkgraph.algos.msbfs import msbfs

    e = turn_adjacency_edges(tdf).where(F.col("conv_id") == "c00000007")
    nodes = e.select(
        F.col("src_turn").cast("long").alias("src"),
        F.col("dst_turn").cast("long").alias("dst"),
    )
    g = LinkGraph.from_undirected(nodes, num_partitions=4)
    res = msbfs(g, [0], emit_distances=True)
    d = res.distances.set_index("vid")["dist"].to_dict()
    assert all(d[k] == k for k in d)


def test_stable_ordering_deterministic(tdf):
    a = stable_turn_order(tdf).select("conv_id", "turn_idx", "turn_rank").toPandas()
    b = stable_turn_order(tdf).select("conv_id", "turn_idx", "turn_rank").toPandas()
    key = ["conv_id", "turn_idx"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_per_turn_text_equality_end_to_end(tdf, spark):
    """sha256 of every (conv_id, turn_idx, text) identical before/after the
    full derive→graph pipeline (text is never touched by graph ops)."""

    def checksum(df):
        return (
            df.select(
                F.sha2(
                    F.concat_ws("\x01", "conv_id", F.col("turn_idx").cast("string"), "text"),
                    256,
                ).alias("h")
            )
            .agg(F.sum(F.crc32(F.col("h"))).alias("chk"), F.count("*").alias("n"))
            .first()
        )

    before = checksum(tdf)
    # run the full derivation + a traversal, then re-checksum the source
    edges = shared_key_conv_edges(tdf, key="tool")
    g, verts = LinkGraph.from_string_vertices(edges, "src_conv", "dst_conv", persist=False)
    g.num_edges()
    after = checksum(tdf)
    assert before == after


def test_relabel_dense_and_degree_desc(tdf):
    edges = shared_key_conv_edges(tdf, key="tool")
    g, verts = LinkGraph.from_string_vertices(edges, "src_conv", "dst_conv", persist=False)
    v = verts.toPandas()
    n = len(v)
    assert sorted(v["vid"]) == list(range(n))  # dense 0..n-1
    # vid 0 is the max-degree vertex (O1 degree-descending relabel)
    deg = g.degrees().toPandas().set_index("vid")["deg"]
    assert deg[0] == deg.max()


# ------------------------------------------------------------ khop sampling
def test_khop_sample_deterministic_and_bounded(spark):
    from linkgraph.fixtures import edges_df, er_edges
    from linkgraph.graph import LinkGraph
    from linkgraph.operators.sampling import khop_sample

    g = LinkGraph.from_undirected(edges_df(spark, er_edges(60, 0.1)), num_partitions=4)
    seeds = [0, 1, 2]
    a = khop_sample(g, seeds, [3, 2]).collect()
    b = khop_sample(g, seeds, [3, 2]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # pure function

    import collections

    per_src = collections.Counter((r["hop"], r["src"]) for r in a)
    assert all(
        c <= (3 if hop == 1 else 2) for (hop, _), c in per_src.items()
    )  # fanout bound per hop
    # hop-1 sources are exactly (a subset of) the seeds
    assert {r["src"] for r in a if r["hop"] == 1} <= set(seeds)
    # hop-2 sources come from hop-1 destinations
    h1_dst = {r["dst"] for r in a if r["hop"] == 1}
    assert {r["src"] for r in a if r["hop"] == 2} <= h1_dst
    # sampled edges are real edges
    edges = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    assert {(r["src"], r["dst"]) for r in a} <= edges
    # different seed -> different sample (overwhelmingly likely)
    c = khop_sample(g, seeds, [3, 2], seed=7).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
    g.unpersist()


def test_edge_pmi_exact(spark):
    import math

    from linkgraph.sources.derive import edge_pmi

    # hub 1 co-occurs with everyone; pair (8, 9) co-occurs only together:
    # PMI must rank (8, 9) above any hub pair despite equal raw counts
    rows = [
        (1, 2, 2), (2, 1, 2), (1, 3, 2), (3, 1, 2), (1, 8, 1), (8, 1, 1),
        (8, 9, 2), (9, 8, 2),
    ]
    df = spark.createDataFrame(rows, "src long, dst long, w long")
    s = {}
    for a, b, w in rows:
        s[a] = s.get(a, 0) + w
    total = sum(w for _, _, w in rows)
    got = {(r.src, r.dst): (r.w, r.pmi) for r in edge_pmi(df).collect()}
    for a, b, w in rows:
        want = round(math.log(w * total / (s[a] * s[b])), 6)
        assert got[(a, b)] == (w, want), (a, b)
    assert got[(8, 9)][1] > got[(1, 2)][1]


def test_frequent_triples_exact(spark):
    import itertools
    from collections import Counter

    from linkgraph.sources.derive import frequent_triples

    baskets = {
        1: [10, 11, 12, 13],
        2: [10, 11, 12],
        3: [10, 11, 12],
        4: [20, 21],            # too small for a triple
        5: list(range(100, 140)),  # 40 items: dropped by basket_cap=32
        6: [10, 11, 13],
    }
    rows = [(k, p) for k, ps in baskets.items() for p in ps]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    want = Counter()
    for k, ps in baskets.items():
        if len(ps) > 32:
            continue
        for t in itertools.combinations(sorted(ps), 3):
            want[t] += 1
    want = {t: c for t, c in want.items() if c >= 2}
    got = {
        (r.p1, r.p2, r.p3): r.support
        for r in frequent_triples(li, min_support=2, basket_cap=32).collect()
    }
    assert got == want
    assert got[(10, 11, 12)] == 3  # orders 1, 2, 3
    assert all(100 <= p <= 140 for t in got for p in t) is False
