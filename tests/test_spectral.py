"""algos/spectral.py: sign split must separate two bridged cliques."""

import itertools


def test_fiedler_splits_two_bridged_cliques(spark):
    from linkgraph.algos.spectral import fiedler_partition
    from linkgraph.graph import LinkGraph

    a, b = [0, 1, 2, 3], [4, 5, 6, 7]
    edges = set()
    for grp in (a, b):
        for u, v in itertools.combinations(grp, 2):
            edges |= {(u, v), (v, u)}
    edges |= {(3, 4), (4, 3)}  # bridge
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    out = fiedler_partition(LinkGraph(df), rounds=8).collect()
    side = {r.vid: r.side for r in out}
    assert len({side[v] for v in a}) == 1
    assert len({side[v] for v in b}) == 1
    assert side[0] != side[4]
    vals = [r.fiedler for r in out]
    assert max(abs(v) for v in vals) == 1.0
    assert all(-1.0 <= v <= 1.0 for v in vals)


def test_batched_closeness_equals_single_batch(spark):
    import itertools

    from linkgraph.algos.msbfs import batched_closeness
    from linkgraph.graph import LinkGraph

    a, b = [0, 1, 2, 3], [4, 5, 6, 7]
    edges = set()
    for grp in (a, b):
        for u, v in itertools.combinations(grp, 2):
            edges |= {(u, v), (v, u)}
    edges |= {(3, 4), (4, 3)}
    g = LinkGraph(spark.createDataFrame(sorted(edges), "src long, dst long"))
    srcs = list(range(8))
    multi, _ = batched_closeness(g, srcs, batch_width=3)
    single, _ = batched_closeness(g, srcs, batch_width=8)
    key = lambda r: (r.src, r.r, r.s, round(r.c, 9))
    assert sorted(map(key, multi.collect())) == sorted(map(key, single.collect()))
