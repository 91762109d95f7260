"""Neighborhood-overlap link prediction (common neighbors / Adamic-Adar).

Classic training-data op for link-graph ML: for every non-adjacent vertex
pair (u, v) that shares at least one neighbor, emit the common-neighbor
count and the Adamic-Adar score  AA(u,v) = Σ_z 1 / ln(deg(z))  over the
shared neighbors z (Adamic & Adar 2003, public formulation).

Shape and scale posture:

* the wedge enumeration is a SELF-join of the edge table on `src` — both
  sides carry the graph's existing src hash-partitioning, so the join is
  co-partitioned and shuffles neither side (the same plan shape as the
  S7 derivation self-join);
* wedge fanout is quadratic in deg(z), so the z side is HUB-CAPPED
  (`hub_cap`): centers with deg > hub_cap are excluded from scoring, the
  standard cap used by co-occurrence/link-prediction pipelines at scale
  (a z with 10^6 neighbors contributes ~0 per-pair signal at a cost of
  10^12 wedges).  The cap is part of the operator contract and is
  mirrored exactly by the SQL oracle;
* deg(z) comes from the graph's cached degree table, joined onto the
  edge table BEFORE the self-join (co-partitioned on src again), so the
  weight rides the wedge rows and the final aggregate needs no second
  pass;
* existing edges are removed with a keyed left-anti join (J3), never a
  full-row except.

Determinism: scores are rounded (`round_to`) and the top-k order sorts by
the ROUNDED score with (cn, u, v) tie-breaks, so Spark's and an oracle's
float summation orders cannot flip ranks inside a rounding bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def link_prediction(
    graph: LinkGraph,
    hub_cap: int,
    min_cn: int = 1,
    topk: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Returns (u, v, cn, aa) with u < v over non-adjacent pairs.

    Requires a symmetric (undirected-closure) edge table: each wedge
    z—u, z—v is enumerated once via dst ordering, so every unordered
    candidate pair appears exactly once.
    """
    if hub_cap < 2:
        raise ValueError("hub_cap must be >= 2 (a center needs two neighbors)")
    edges = graph.edges.select("src", "dst")
    # deg >= 2: a center with one neighbor forms no wedge; also keeps
    # 1/ln(deg) finite.  deg <= hub_cap: scale cap, see module docstring.
    zw = (
        graph.degrees()
        .where((F.col("deg") >= 2) & (F.col("deg") <= hub_cap))
        .select(F.col("vid").alias("src"), (F.lit(1.0) / F.log(F.col("deg"))).alias("zw"))
    )
    ez = edges.join(zw, "src")  # co-partitioned on src; weight rides the edge row
    a, b = ez.alias("a"), ez.alias("b")
    wedge_cond = (F.col("a.src") == F.col("b.src")) & (
        F.col("a.dst") < F.col("b.dst")
    )
    # The (u, v) aggregate dominates this operator (measured: ~2/3 of the
    # bench query is the final hash aggregate over ~|wedges| near-unique
    # keys).  Pack the pair into ONE long key u*(max_vid+1)+v — a
    # bijection for 0 <= vid <= max_vid — halving grouping-key bytes and
    # hash/compare cost in both the aggregate and the left-anti
    # edge-removal join (which becomes single-column).  Falls back to the
    # two-column key when vids are too large to pack without overflow.
    mv = graph.max_vid() + 1
    if mv <= (1 << 31):
        mvl = F.lit(int(mv))
        wedges = a.join(b, wedge_cond).select(
            (F.col("a.dst") * mvl + F.col("b.dst")).alias("uv"),
            F.col("a.zw").alias("zw"),
        )
        # repartition-then-aggregate, deliberately SKIPPING the map-side
        # partial aggregate: candidate pairs are near-unique (measured
        # 120M wedges -> 87.4M distinct pairs at bench SF, reduction
        # 1.37x), so map-side combine builds a multi-million-entry hash
        # map per task, reduces almost nothing, spills, and THEN shuffles
        # anyway.  An explicit uv-hash exchange first makes the map side
        # a plain shuffle write and runs the one real aggregate on
        # uv-clustered input.  4x shuffle.partitions keeps each task's
        # hash map small enough to stay in memory (measured 32 -> 9.9s,
        # 64 -> 7.0s, 128 -> 6.5s for the aggregate at 32 cores).
        p_agg = 4 * int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        pairs = (
            wedges.repartition(p_agg, "uv")
            .groupBy("uv")
            .agg(
                F.count(F.lit(1)).alias("cn"),
                F.round(F.sum("zw"), round_to).alias("aa"),
            )
            .where(F.col("cn") >= min_cn)
        )
        ekeys = edges.select((F.col("src") * mvl + F.col("dst")).alias("uv"))
        out = pairs.join(ekeys, "uv", "left_anti").select(
            F.expr(f"CAST(uv DIV {int(mv)} AS BIGINT)").alias("u"),
            F.expr(f"CAST(uv % {int(mv)} AS BIGINT)").alias("v"),
            F.col("cn").cast("long").alias("cn"),
            "aa",
        )
    else:
        pairs = (
            a.join(b, wedge_cond)
            .groupBy(F.col("a.dst").alias("u"), F.col("b.dst").alias("v"))
            .agg(
                F.count(F.lit(1)).alias("cn"),
                F.round(F.sum(F.col("a.zw")), round_to).alias("aa"),
            )
            .where(F.col("cn") >= min_cn)
        )
        out = pairs.join(
            edges, (pairs.u == edges.src) & (pairs.v == edges.dst), "left_anti"
        ).select(
            F.col("u").cast("long").alias("u"),
            F.col("v").cast("long").alias("v"),
            F.col("cn").cast("long").alias("cn"),
            "aa",
        )
    if topk is not None:
        out = out.orderBy(
            F.col("aa").desc(), F.col("cn").desc(), F.col("u").asc(), F.col("v").asc()
        ).limit(topk)
    return out


def vertex_similarity(
    graph: LinkGraph,
    hub_cap: int,
    min_cn: int = 2,
    topk: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Structural vertex similarity: (u, v, cn, cosine, jaccard) with u < v.

    cosine  = cn / sqrt(deg(u)·deg(v))   (Salton index)
    jaccard = cn / (deg(u) + deg(v) − cn)

    cn counts common neighbors reached through centers z with
    deg(z) ∈ [2, hub_cap] — the same hub cap (and for the same quadratic
    wedge-fanout reason) as `link_prediction`; the cap is part of the
    operator contract, mirrored by the SQL oracle.  Unlike link
    prediction the adjacency of (u, v) is irrelevant — similarity is
    defined for neighbors and non-neighbors alike — so there is no
    anti-join.  deg(u)/deg(v) are the FULL degrees from the graph's
    cached degree table (only the wedge centers are capped).

    Plan shape: one co-partitioned self-join on `src` (zero shuffle on
    the edge sides), one (u, v) aggregate, then two |V|-row degree joins
    that AQE broadcasts when small and hash-joins when not.  Determinism:
    scores round to `round_to` and the top-k order breaks ties on
    (cn, u, v), so cross-engine float summation cannot flip ranks.
    """
    if hub_cap < 2:
        raise ValueError("hub_cap must be >= 2 (a center needs two neighbors)")
    edges = graph.edges.select("src", "dst")
    centers = (
        graph.degrees()
        .where((F.col("deg") >= 2) & (F.col("deg") <= hub_cap))
        .select(F.col("vid").alias("src"))
    )
    ez = edges.join(centers, "src")  # co-partitioned on src
    a, b = ez.alias("a"), ez.alias("b")
    wedge_cond = (F.col("a.src") == F.col("b.src")) & (
        F.col("a.dst") < F.col("b.dst")
    )
    mv = graph.max_vid() + 1
    if mv <= (1 << 31):
        # packed single-long pair key + repartition-then-aggregate — the
        # same two measured wins as link_prediction (see its comments)
        mvl = F.lit(int(mv))
        p_agg = 4 * int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        pairs = (
            a.join(b, wedge_cond)
            .select((F.col("a.dst") * mvl + F.col("b.dst")).alias("uv"))
            .repartition(p_agg, "uv")
            .groupBy("uv")
            .agg(F.count(F.lit(1)).alias("cn"))
            .where(F.col("cn") >= min_cn)
            .select(
                F.expr(f"CAST(uv DIV {int(mv)} AS BIGINT)").alias("u"),
                F.expr(f"CAST(uv % {int(mv)} AS BIGINT)").alias("v"),
                "cn",
            )
        )
    else:
        pairs = (
            a.join(b, wedge_cond)
            .groupBy(F.col("a.dst").alias("u"), F.col("b.dst").alias("v"))
            .agg(F.count(F.lit(1)).alias("cn"))
            .where(F.col("cn") >= min_cn)
        )
    deg = graph.degrees()
    du = deg.select(F.col("vid").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("vid").alias("v"), F.col("deg").alias("dv"))
    out = (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.col("u").cast("long").alias("u"),
            F.col("v").cast("long").alias("v"),
            F.col("cn").cast("long").alias("cn"),
            F.round(
                F.col("cn") / F.sqrt(F.col("du").cast("double") * F.col("dv")),
                round_to,
            ).alias("cosine"),
            F.round(
                F.col("cn").cast("double") / (F.col("du") + F.col("dv") - F.col("cn")),
                round_to,
            ).alias("jaccard"),
        )
    )
    if topk is not None:
        out = out.orderBy(
            F.col("cosine").desc(),
            F.col("cn").desc(),
            F.col("u").asc(),
            F.col("v").asc(),
        ).limit(topk)
    return out


def triadic_closure_rate(
    tedges: DataFrame, hub_cap: int = 64, round_to: int = 6
) -> DataFrame:
    """Temporal triadic closure [Kossinets & Watts, Science '06]: for
    every directed wedge a→b→c (a ≠ c) the pair (a, c) is "closed" if
    the edge a→c formed STRICTLY AFTER the wedge did (tf = the later of
    the two wedge edges' first-seen times).  Returns one row per wedge
    formation month: (month, n_wedges, n_closed, closure_rate) — the
    how-fast-does-my-graph-densify curve GNN/link-prediction training
    pipelines use to pick temporal train/test splits.

    Input: (src, dst, t) directed FIRST-FORMATION times (one row per
    edge; derive with a min-t rollup).  Same wedge budget as
    link_prediction: the center self-join is quadratic in deg(b), so
    centers with total degree > hub_cap are excluded — part of the
    operator contract, mirrored by the oracle.  Closure is checked with
    ONE keyed left join against the edge table (never an all-pairs
    scan); months ride the wedge rows so the final rollup is one
    map-side-combined aggregate over ≤#months groups.
    """
    e = tedges.select("src", "dst", "t")
    deg = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .where(F.col("deg") <= F.lit(int(hub_cap)))
    )
    din = e.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("t").alias("t1")
    )
    dout = e.select(
        F.col("src").alias("b"), F.col("dst").alias("c"), F.col("t").alias("t2")
    )
    wedges = (
        din.join(deg.select(F.col("v").alias("b")), "b", "left_semi")
        .join(dout, "b")
        .where(F.col("a") != F.col("c"))
        .select(
            "a", "c", F.greatest(F.col("t1"), F.col("t2")).alias("tf")
        )
    )
    closing = e.select(
        F.col("src").alias("a"), F.col("dst").alias("c"), F.col("t").alias("t3")
    )
    scored = wedges.join(closing, ["a", "c"], "left").select(
        F.date_format("tf", "yyyy-MM").alias("month"),
        F.when(F.col("t3") > F.col("tf"), 1).otherwise(0).alias("closed"),
    )
    return scored.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_wedges"),
        F.sum("closed").cast("long").alias("n_closed"),
        F.round(F.sum("closed") / F.count(F.lit(1)), round_to).alias("closure_rate"),
    )
