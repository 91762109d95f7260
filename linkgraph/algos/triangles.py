"""Triangle counting (SURVEY.md J5/A7) — non-iterative, 3-stage relational plan.

Orient edges src<dst (each undirected edge once), build 2-paths, close with
a semi-join against the oriented edge table.  Each triangle a<b<c is counted
exactly once.  At scale: degree-ordered orientation (orient from lower- to
higher-degree endpoint) bounds 2-path blowup on hubs — implemented via the
`by_degree` flag; both orientations count identically (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _oriented(graph: LinkGraph, by_degree: bool) -> DataFrame:
    e = graph.edges.where(F.col("src") < F.col("dst"))
    if not by_degree:
        return e
    # orient each undirected edge from lower-degree to higher-degree endpoint
    # (ties by vid) — the classic wedge-count reduction for skewed graphs.
    deg = graph.degrees()
    ds = deg.select(F.col("vid").alias("src"), F.col("deg").alias("sdeg"))
    dd = deg.select(F.col("vid").alias("dst"), F.col("deg").alias("ddeg"))
    w = e.join(ds, "src").join(dd, "dst")
    keep = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    fwd = w.where(keep).select("src", "dst")
    rev = w.where(~keep).select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.union(rev)


def triangle_paths(graph: LinkGraph, by_degree: bool = False) -> DataFrame:
    """(a, b, c) triples forming triangles; unique per triangle."""
    e = _oriented(graph, by_degree)
    if by_degree:
        # the oriented table feeds all THREE join legs (e1, e2, closing);
        # unpersisted, the degree-orientation (two broadcast joins + the
        # fwd/rev union over |E|) was evaluated three times per plan
        # (r6 profile).  One shared cache computes it once; the
        # ContextCleaner reaps the block when the result is dropped.
        from pyspark.storagelevel import StorageLevel

        e = e.persist(StorageLevel.MEMORY_AND_DISK)
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    paths = e1.join(e2, "b")
    closing = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return paths.join(closing, ["a", "c"], "left_semi")


def triangle_count(graph: LinkGraph, by_degree: bool = False) -> int:
    return triangle_paths(graph, by_degree).count()


def triangles_per_vertex(graph: LinkGraph, by_degree: bool = False) -> DataFrame:
    """(vid, tri) for vertices in ≥1 triangle (explode 3 corners)."""
    t = triangle_paths(graph, by_degree)
    corners = (
        t.select(F.col("a").alias("vid"))
        .union(t.select(F.col("b").alias("vid")))
        .union(t.select(F.col("c").alias("vid")))
    )
    return corners.groupBy("vid").agg(F.count("*").alias("tri"))


def clustering_coefficients(graph: LinkGraph, by_degree: bool = True) -> DataFrame:
    """(vid, deg, tri, lcc) over all vertices of the symmetric graph:
    lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), 0 for deg < 2.

    One extra left join over `triangles_per_vertex` — the triangle plan
    (degree-ordered wedges + closing semi-join) dominates; the join is
    |V|-row × |V|-row on vid."""
    deg = graph.degrees()
    tri = triangles_per_vertex(graph, by_degree)
    return (
        deg.join(tri, "vid", "left")
        .select(
            F.col("vid").cast("long").alias("vid"),
            F.col("deg").cast("long").alias("deg"),
            F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri"),
            F.when(
                F.col("deg") >= 2,
                2.0 * F.coalesce(F.col("tri"), F.lit(0)) / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def transitivity(graph: LinkGraph, by_degree: bool = True) -> float:
    """Global transitivity = 3·triangles / wedges, where wedges =
    Σ_v deg(v)·(deg(v)−1)/2.  Two scalar aggregates (the triangle count
    and the degree-moment sum) — no per-vertex join needed."""
    tri3 = 3 * triangle_count(graph, by_degree)
    wedges = (
        graph.degrees()
        .agg(F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w"))
        .first()["w"]
    )
    return float(tri3 / wedges) if wedges else 0.0


def square_count(graph: LinkGraph) -> DataFrame:
    """Exact 4-cycle (square) count, one row (n_squares).

    Every square a–b–c–d has exactly two diagonals (a,c) and (b,d), and
    a diagonal pair (u,v) with cn common neighbors closes C(cn,2)
    squares — so  #C4 = Σ_{u<v} C(cn(u,v), 2) / 2  (each square counted
    once per diagonal).  The sum is always even; the division is exact
    integer arithmetic, so the result is engine-portable with no
    rounding convention.

    Shape: the same co-partitioned wedge self-join as vertex_similarity
    / link_prediction feeding one global aggregate.  The wedge fanout is
    Σ deg² — on hub-heavy graphs cap the centers (the capped variant is
    a lower bound) or square-count the k-core; the driver query runs the
    exact form on the shared-key user graph where Σ deg² is bounded.
    """
    edges = graph.edges.select("src", "dst")
    a, b = edges.alias("a"), edges.alias("b")
    wedge_cond = (F.col("a.src") == F.col("b.src")) & (
        F.col("a.dst") < F.col("b.dst")
    )
    mv = graph.max_vid() + 1
    if mv <= (1 << 31):
        # packed single-long pair key + repartition-then-aggregate: the
        # same two measured linkpred wins (near-unique pair keys make the
        # map-side partial aggregate pure overhead; see linkpred.py)
        p_agg = 4 * int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        cn = (
            a.join(b, wedge_cond)
            .select((F.col("a.dst") * F.lit(int(mv)) + F.col("b.dst")).alias("uv"))
            .repartition(p_agg, "uv")
            .groupBy("uv")
            .agg(F.count(F.lit(1)).alias("cn"))
        )
    else:
        cn = (
            a.join(b, wedge_cond)
            .groupBy(F.col("a.dst").alias("u"), F.col("b.dst").alias("v"))
            .agg(F.count(F.lit(1)).alias("cn"))
        )
    # all-integer: cn(cn-1) is even, the pair sum is even — two exact
    # integer DIVs, never a double (a 1e9-pair sum would exceed 2^53)
    return cn.select(
        F.expr("CAST(cn * (cn - 1) AS BIGINT) DIV 2").alias("p")
    ).agg(F.expr("SUM(p) DIV 2").cast("long").alias("n_squares"))


def graphlet_census(graph: LinkGraph) -> DataFrame:
    """Small-motif census, one all-integer row:

        wedges    = Σ_v C(deg v, 2)         (paths of length 2)
        triangles = closed wedges / 3        (each K3 holds 3 wedges)
        stars3    = Σ_v C(deg v, 3)         (claws / 3-stars)
        paths3    = Σ_{(u,v)∈E, u<v} (deg u − 1)(deg v − 1) − 3·triangles
                                             (paths of length 3: the
                                             per-edge product counts one
                                             middle edge per path and
                                             over-counts each triangle's
                                             three cherry pairs)

    — the network-motif profile (triad census for undirected graphs)
    that feeds graphlet-kernel features and null-model comparisons.
    wedges/stars come from the cached degree table alone (|V|-row
    aggregate, no edge scan); paths3 adds one degree-joined edge scan;
    triangles reuse the degree-ordered oriented count.  Everything is
    exact 64-bit integer arithmetic — no rounding convention.
    """
    deg = graph.degrees()
    # per-row integer DIV (both products are divisible exactly), then a
    # long SUM — a double sum would lose exactness past 2^53
    mo = deg.select(
        F.expr("CAST(deg AS BIGINT) * (deg - 1) DIV 2").alias("w"),
        F.expr("CAST(deg AS BIGINT) * (deg - 1) * (deg - 2) DIV 6").alias("s3"),
    ).agg(
        F.sum("w").cast("long").alias("wedges"),
        F.sum("s3").cast("long").alias("stars3"),
    )
    tri = int(triangle_count(graph, by_degree=True))
    e = graph.edges.where(F.col("src") < F.col("dst"))
    du = deg.select(F.col("vid").alias("src"), F.col("deg").alias("du"))
    dv = deg.select(F.col("vid").alias("dst"), F.col("deg").alias("dv"))
    p3 = (
        e.join(du, "src")
        .join(dv, "dst")
        .agg(
            F.sum((F.col("du") - 1).cast("long") * (F.col("dv") - 1))
            .cast("long")
            .alias("s")
        )
    )
    return (
        mo.crossJoin(p3)
        .select(
            "wedges",
            F.lit(tri).cast("long").alias("triangles"),
            "stars3",
            (F.col("s") - F.lit(3 * tri)).cast("long").alias("paths3"),
        )
    )


def local_bridges(graph: LinkGraph) -> DataFrame:
    """(src, dst, src_deg, dst_deg) for every src<dst edge whose
    endpoints share NO common neighbor — Granovetter's local bridges.
    Removing such an edge raises its endpoints' distance above 2, so
    these are the ties that span otherwise-disconnected social
    neighborhoods: the structural-hole readout a community analysis
    ships next to its triangle/k-truss tables (k-truss keeps the
    embedded core; this surfaces the exact complement, support = 0).

    Plan: oriented wedge join + closing semi-join (the `_supports`
    shape from the k-truss peel) produces each edge that sits in ≥1
    triangle; a LEFT ANTI join against those sides keeps support-0
    edges without ever counting — cheaper than the left-join+COALESCE
    support form when only the zero class is wanted.  Degrees ride in
    on two vid-keyed joins of the |V|-row degree table.  No driver
    action; at scale the wedge join is the same degree-ordered-safe
    shape as triangle counting.
    """
    t = graph.edges.where(F.col("src") < F.col("dst")).select("src", "dst")
    e1 = t.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = t.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    closing = t.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(closing, ["a", "c"], "inner")
    sides = (
        tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(tri.select(F.col("b").alias("src"), F.col("c").alias("dst")))
        .union(tri.select(F.col("a").alias("src"), F.col("c").alias("dst")))
    )
    bridges = t.join(sides, ["src", "dst"], "left_anti")
    deg = graph.degrees()
    ds = deg.select(F.col("vid").alias("src"), F.col("deg").alias("src_deg"))
    dd = deg.select(F.col("vid").alias("dst"), F.col("deg").alias("dst_deg"))
    return bridges.join(ds, "src").join(dd, "dst").select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("src_deg").cast("long").alias("src_deg"),
        F.col("dst_deg").cast("long").alias("dst_deg"),
    )


def doulion_sampled_graph(graph: LinkGraph, p: float, tag: str = "#tri") -> LinkGraph:
    """Doulion edge-sparsified graph [Tsourakakis KDD'09]: keep each
    undirected edge with probability p via the deterministic canonical-
    pair md5 coin (both directions draw the SAME coin, so the sample
    stays symmetric; the same coin family as edge_percolation).  Exact
    triangle count on the sample times 1/p³ is an unbiased estimator of
    the full count — counting on a p-sparsified graph costs ~p³ of the
    wedge-join work, the cheap first answer at 100 TB before committing
    to the exact orientation join.
    """
    from linkgraph.textops.dedup import portable_hash60

    if not (0.0 < p <= 1.0):
        raise ValueError(f"doulion_sampled_graph: p={p} outside (0, 1]")
    coin = F.pmod(
        portable_hash60(
            F.concat(
                F.least("src", "dst").cast("string"),
                F.lit("#"),
                F.greatest("src", "dst").cast("string"),
                F.lit(tag),
            )
        ),
        F.lit(10_000),
    )
    return LinkGraph(
        graph.edges.where(coin < int(round(p * 10_000))).select("src", "dst"),
        materialize=False,
    )
