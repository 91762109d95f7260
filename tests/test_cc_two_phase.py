"""Two-phase (large-star/small-star) CC ≡ pointer-doubling min-label CC:
the cross-kernel consistency gate, plus shape cases the rewrite must
survive (long path, disjoint cycles, star hubs)."""

import warnings

import pytest

from linkgraph.algos.components import (
    connected_components,
    connected_components_two_phase,
)
from linkgraph.fixtures import edges_df, er_edges
from linkgraph.graph import LinkGraph


@pytest.fixture(scope="module")
def er(spark):
    return LinkGraph.from_undirected(
        edges_df(spark, er_edges(150, 0.03)), num_partitions=8
    )


def _comp(df):
    return {r["vid"]: r["comp"] for r in df.collect()}


def test_two_phase_equals_min_label(er):
    assert _comp(connected_components_two_phase(er)) == _comp(
        connected_components(er)
    )


def test_two_phase_long_path_and_cycles(spark):
    path = [(i, i + 1) for i in range(200)]
    cyc = [(1000 + i, 1000 + (i + 1) % 40) for i in range(40)]
    g = LinkGraph.from_undirected(edges_df(spark, path + cyc), num_partitions=8)
    got = _comp(connected_components_two_phase(g))
    assert all(got[v] == 0 for v in range(201))
    assert all(got[1000 + i] == 1000 for i in range(40))


def test_two_phase_star_hub(spark):
    # a hub star plus one detached edge: the hub group is the skew case
    e = [(500, i) for i in range(100)] + [(900, 901)]
    g = LinkGraph.from_undirected(edges_df(spark, e), num_partitions=8)
    got = _comp(connected_components_two_phase(g))
    assert all(got[i] == 0 for i in list(range(100)) + [500])
    assert got[900] == got[901] == 900


def test_two_phase_budget_warns(spark):
    path = [(i, i + 1) for i in range(64)]
    g = LinkGraph.from_undirected(edges_df(spark, path), num_partitions=4)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components_two_phase(g, max_rounds=1).collect()
    assert any("max_rounds" in str(x.message) for x in w)
