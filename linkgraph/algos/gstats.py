"""Whole-graph summary statistics (size, degree moments, assortativity).

One row out: |V|, directed |E|, mean/max degree, and the degree
assortativity coefficient (Newman 2002) — the Pearson correlation of
(deg(src), deg(dst)) over the directed edge list.  Assortativity is the
standard first diagnostic on a web-scale link graph (social graphs are
assortative, web/co-occurrence graphs disassortative) and drives the
engine's own tuning choices (hub caps, salting thresholds).

Scale shape — the naive plan joins the degree table onto the edge list
twice and correlates |E| rows; the dst-side join would shuffle the whole
edge table.  Instead the correlation is decomposed into exact integer
moment sums with one co-partitioned join and one |V|-sized join:

  1. join deg(src) onto edges — co-partitioned on src, no edge shuffle;
  2. per-dst partial aggregate (map-side combine): count, Σdx, Σdx² —
     the shuffle carries |V| partial rows, never |E|;
  3. join deg(dst) onto the |V|-row partials and fold the cross moments:
     Σdy = Σ c·dy, Σdy² = Σ c·dy², Σdxdy = Σ s1·dy.

Moment sums accumulate as double, NOT long: at 10^12 edges Σdeg² can
exceed int64, which Spark wraps silently while SQL engines promote to
int128 — a silent cross-engine divergence.  Double sums are exact below
2^53 and a correlation coefficient only needs ~1e-10 relative accuracy
above that, so the rounded value stays engine-portable at every scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def graph_stats(graph: LinkGraph, round_to: int = 6) -> DataFrame:
    """Returns one row: (n_vertices, n_edges, avg_deg, max_deg, assortativity)."""
    deg = graph.degrees()
    edges = graph.edges.select("src", "dst")

    ez = edges.join(deg.select(F.col("vid").alias("src"), "deg"), "src")
    dx = F.col("deg").cast("double")
    partial = ez.groupBy("dst").agg(
        F.count(F.lit(1)).cast("double").alias("c"),
        F.sum(dx).alias("s1"),
        F.sum(dx * dx).alias("s2"),
    )
    dy = F.col("dy").cast("double")
    moments = (
        partial.join(deg.select(F.col("vid").alias("dst"), F.col("deg").alias("dy")), "dst")
        .agg(
            F.sum("c").alias("m"),
            F.sum("s1").alias("sx"),
            F.sum("s2").alias("sxx"),
            F.sum(F.col("c") * dy).alias("sy"),
            F.sum(F.col("c") * dy * dy).alias("syy"),
            F.sum(F.col("s1") * dy).alias("sxy"),
        )
    )
    n = graph.num_vertices()
    max_deg = deg.agg(F.max("deg").alias("d")).first()["d"]
    r = moments.select(
        F.lit(n).cast("long").alias("n_vertices"),
        F.col("m").cast("long").alias("n_edges"),
        F.round(F.col("m").cast("double") / F.lit(float(n)), round_to).alias("avg_deg"),
        F.lit(int(max_deg)).cast("long").alias("max_deg"),
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            round_to,
        ).alias("assortativity"),
    )
    return r


def community_modularity(graph: LinkGraph, labels: DataFrame) -> DataFrame:
    """Per-community Newman modularity decomposition over a symmetric edge
    table: for each community c,

        q_c = in_c / M  -  (d_c / M)^2

    where M = |directed edges| = 2m, in_c = directed edges with BOTH
    endpoints in c, d_c = sum of member degrees.  Σ_c q_c is the classic
    undirected modularity Q — the standard fitness score for any label
    assignment (LPA, Louvain, metadata communities).

    Returns (label, n_vertices, internal_edges, degree_sum, q_contrib)
    with q_contrib rounded to 6 (exact BIGINT counts divided as IEEE
    doubles — same two flops in any engine, so oracle-stable).

    Scale shape: one co-partitioned join puts lab(src) on the edge list
    (no edge shuffle off the src-partitioned store); the dst-side label
    arrives by a second hash join whose build side is the |V|-row label
    table; the per-community counts then map-side combine to ≤|C| rows.
    M rides in as a broadcast scalar, never a driver round-trip inside
    the plan.  labels must cover every vertex (LPA/CC output does).
    """
    if graph.symmetric is False:
        raise ValueError("community_modularity expects a symmetric graph")
    lab = labels.select(F.col("vid").cast("long").alias("vid"), "label")
    e = graph.edges.select("src", "dst")
    m_row = e.groupBy().agg(F.count("*").cast("double").alias("M"))

    internal = (
        e.join(lab.withColumnRenamed("vid", "src").withColumnRenamed("label", "ls"), "src")
        .join(lab.withColumnRenamed("vid", "dst").withColumnRenamed("label", "ld"), "dst")
        .where(F.col("ls") == F.col("ld"))
        .groupBy(F.col("ls").alias("label"))
        .agg(F.count("*").alias("internal_edges"))
    )
    comm = (
        graph.degrees()
        .join(lab, "vid")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vertices"),
            F.sum("deg").alias("degree_sum"),
        )
    )
    return (
        comm.join(internal, "label", "left")
        .crossJoin(F.broadcast(m_row))
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("n_vertices").cast("long").alias("n_vertices"),
            F.coalesce(F.col("internal_edges"), F.lit(0))
            .cast("long")
            .alias("internal_edges"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            F.round(
                F.coalesce(F.col("internal_edges"), F.lit(0)) / F.col("M")
                - (F.col("degree_sum") / F.col("M"))
                * (F.col("degree_sum") / F.col("M")),
                6,
            ).alias("q_contrib"),
        )
    )


def degree_histogram(graph: LinkGraph) -> DataFrame:
    """Log2-bucketed degree histogram: (bucket, n_vertices, min_deg,
    max_deg) with bucket = floor(log2(deg)).

    The standard first look at any web-scale graph (is it power-law?
    where do the hubs start?).  One |V|-row aggregate over the cached
    degree table — no edge scan.  log2 of an integer is engine-portable
    at the bucket boundaries: powers of two are exact in IEEE log2 (the
    only inputs where floor sits on a knife edge), so both engines cut
    identical buckets.  All-integer output.
    """
    return (
        graph.degrees()
        .groupBy(F.floor(F.log2(F.col("deg"))).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.min("deg").cast("long").alias("min_deg"),
            F.max("deg").cast("long").alias("max_deg"),
        )
    )


def powerlaw_alpha(graph: LinkGraph, dmin: int, round_to: int = 6) -> DataFrame:
    """Discrete power-law exponent MLE over the degree tail deg >= dmin:
    one row (dmin, n_tail, alpha) with

        alpha = 1 + n / Σ ln(deg / (dmin − 0.5))

    — the Clauset–Shalizi–Newman continuous-approximation estimator
    (SIAM Rev. 2009, public formulation), the number every "is this graph
    scale-free?" analysis reports.  dmin is a caller-chosen cut (CSN's
    KS-scan over candidate cuts is a ≤|candidates| loop of this same
    aggregate).  One filtered |V|-row aggregate; the float LN sum is
    absorbed by a single division + round, tie-free since the output is
    one row.
    """
    if dmin < 1:
        raise ValueError("dmin must be >= 1")
    tail = graph.degrees().where(F.col("deg") >= dmin)
    return tail.agg(
        F.lit(int(dmin)).cast("long").alias("dmin"),
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.round(
            F.lit(1.0)
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("deg") / F.lit(dmin - 0.5))),
            round_to,
        ).alias("alpha"),
    )


def partition_conductance(
    graph: LinkGraph, labels: DataFrame, round_to: int = 6
) -> DataFrame:
    """Per-class cut quality of a vertex partition: for each label c,

        vol_c = Σ_{v∈c} deg(v)         (directed endpoint count)
        cut_c = |{(u,v) : u∈c, v∉c}|   (directed cross edges out of c)
        φ_c   = cut_c / min(vol_c, 2m − vol_c)

    — the conductance score every partitioner evaluation reports (how
    much shuffle does this assignment cost? a hash partitioner's φ → 1
    as classes shrink; a good locality partitioner drives it down).
    Works for ANY label table (hash buckets, Louvain/LPA communities,
    relabel ranges).  Returns (label, n_vertices, vol, cut, conductance);
    conductance is NULL for a degenerate class (vol 0 or the whole
    graph) — min(vol, 2m−vol) = 0 has no defined score.

    Scale shape (community_modularity's): label lands on the edge list
    by one co-partitioned src join + one |V|-row-build dst join, the cut
    count map-side combines to ≤|C| rows, and 2m rides in broadcast.
    Exact integer counts; ONE IEEE division + round ⟹ engine-portable.
    """
    if graph.symmetric is False:
        raise ValueError("partition_conductance expects a symmetric graph")
    lab = labels.select(F.col("vid").cast("long").alias("vid"), "label")
    e = graph.edges.select("src", "dst")
    m_row = e.groupBy().agg(F.count("*").cast("double").alias("M2"))

    cut = (
        e.join(
            lab.withColumnRenamed("vid", "src").withColumnRenamed("label", "ls"),
            "src",
        )
        .join(
            lab.withColumnRenamed("vid", "dst").withColumnRenamed("label", "ld"),
            "dst",
        )
        .where(F.col("ls") != F.col("ld"))
        .groupBy(F.col("ls").alias("label"))
        .agg(F.count("*").alias("cut"))
    )
    vol = (
        graph.degrees()
        .join(lab, "vid")
        .groupBy("label")
        .agg(F.count("*").alias("n_vertices"), F.sum("deg").alias("vol"))
    )
    denom = F.least(F.col("vol").cast("double"), F.col("M2") - F.col("vol"))
    return (
        vol.join(cut, "label", "left")
        .crossJoin(F.broadcast(m_row))
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("n_vertices").cast("long").alias("n_vertices"),
            F.col("vol").cast("long").alias("vol"),
            F.coalesce(F.col("cut"), F.lit(0)).cast("long").alias("cut"),
            F.round(
                F.coalesce(F.col("cut"), F.lit(0))
                / F.when(denom > 0, denom),
                round_to,
            ).alias("conductance"),
        )
    )


def reciprocity(edges: DataFrame, round_to: int = 6) -> DataFrame:
    """Directed-graph reciprocity: one row (n_edges, n_reciprocal, r)
    with r = |{(u,v) : (v,u) ∈ E}| / |E| over a DIRECTED edge table —
    the standard first asymmetry measure (how much of the graph is
    two-way?).  A symmetric-closure table trivially scores 1; run it on
    genuinely directed derivations (turn adjacency, sequential chains).

    One left-semi join against the transpose (J4, co-partitioned when
    the table is hash-partitioned on src) + one count each side; exact
    integers, ONE IEEE division + round.
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    t = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(t, ["src", "dst"], "left_semi")
    return (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(recip.agg(F.count(F.lit(1)).alias("n_reciprocal")))
        .select(
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_reciprocal").cast("long").alias("n_reciprocal"),
            F.round(
                F.col("n_reciprocal") / F.col("n_edges").cast("double"), round_to
            ).alias("r"),
        )
    )


def rich_club(graph: LinkGraph, ks: list[int], round_to: int = 6) -> DataFrame:
    """Rich-club curve: for each degree cut k, (k, n_nodes, n_edges, phi)
    over the subgraph induced by vertices with deg > k, with
    phi(k) = E_k / (N_k·(N_k−1)) on the directed edge count — the
    "do hubs preferentially interlink?" diagnostic [Colizza et al. 2006]
    every hub-capped operator here implicitly bets on.

    ONE pass each side: the edge scan classifies every edge by
    m = min(deg(src), deg(dst)) and the vertex scan by deg, then each
    cut reads the classified rows with a conditional aggregate — the cut
    list never multiplies the scan (a per-k loop would rescan \\|E\\|
    per cut).  Counts are exact integers; phi is ONE division + round.
    Degenerate cuts (N_k < 2) give NULL phi.
    """
    if not ks:
        raise ValueError("ks must be non-empty")
    ks = sorted(set(int(k) for k in ks))
    deg = graph.degrees()
    e = (
        graph.edges.select("src", "dst")
        .join(deg.select(F.col("vid").alias("src"), F.col("deg").alias("ds")), "src")
        .join(deg.select(F.col("vid").alias("dst"), F.col("deg").alias("dd")), "dst")
        .select(F.least("ds", "dd").alias("m"))
    )
    e_aggs = [
        F.sum(F.when(F.col("m") > k, 1).otherwise(0)).cast("long").alias(f"e{k}")
        for k in ks
    ]
    v_aggs = [
        F.sum(F.when(F.col("deg") > k, 1).otherwise(0)).cast("long").alias(f"n{k}")
        for k in ks
    ]
    erow = e.agg(*e_aggs)
    vrow = deg.agg(*v_aggs)
    both = erow.crossJoin(vrow)
    rows = [
        both.select(
            F.lit(k).cast("long").alias("k"),
            F.col(f"n{k}").alias("n_nodes"),
            F.col(f"e{k}").alias("n_edges"),
            F.round(
                F.col(f"e{k}")
                / F.when(
                    F.col(f"n{k}") >= 2,
                    (F.col(f"n{k}") * (F.col(f"n{k}") - 1)).cast("double"),
                ),
                round_to,
            ).alias("phi"),
        )
        for k in ks
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def label_assortativity(
    graph: LinkGraph, labels: DataFrame, round_to: int = 6
) -> DataFrame:
    """Newman's discrete assortativity over a label assignment: one row
    (n_edges, n_same, r) with

        r = (M·Σ_i C_ii − Σ_i R_i·S_i) / (M² − Σ_i R_i·S_i)

    (C = directed label-mixing counts, R_i/S_i row/column totals, M =
    directed edge count) — "do conversations link within their own class
    more than chance?" for ANY vertex label (community, language,
    source, shard).  The float form (e_ii fractions) is algebraically
    rearranged to EXACT integer counts feeding one division + round;
    the integer products cap at M², so past M ≈ 3·10⁹ promote the two
    products to DECIMAL — noted in-line, immaterial at sandbox scale.
    The mixing matrix is ≤|labels|² rows; labels must cover every vertex.
    """
    lab = labels.select(F.col("vid").cast("long").alias("vid"), "label")
    e = graph.edges.select("src", "dst")
    mix = (
        e.join(lab.withColumnRenamed("vid", "src").withColumnRenamed("label", "ls"), "src")
        .join(lab.withColumnRenamed("vid", "dst").withColumnRenamed("label", "ld"), "dst")
        .groupBy("ls", "ld")
        .agg(F.count(F.lit(1)).alias("c"))
    ).persist()
    rows = mix.groupBy("ls").agg(F.sum("c").alias("r"))
    cols = mix.groupBy("ld").agg(F.sum("c").alias("s"))
    rs = (
        rows.join(cols, rows.ls == cols.ld)
        .agg(F.sum(F.col("r") * F.col("s")).alias("rs"))
    )
    diag = mix.where(F.col("ls") == F.col("ld")).agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_same")
    )
    tot = mix.agg(F.sum("c").alias("m"))
    out = (
        tot.crossJoin(diag)
        .crossJoin(rs)
        .select(
            F.col("m").cast("long").alias("n_edges"),
            F.col("n_same").cast("long").alias("n_same"),
            F.round(
                (F.col("m").cast("double") * F.col("n_same") - F.col("rs"))
                / (F.col("m").cast("double") * F.col("m") - F.col("rs")),
                round_to,
            ).alias("r"),
        )
    )
    out = out.localCheckpoint(eager=True)
    mix.unpersist()
    return out


def graph_diff(
    old_edges: DataFrame, new_edges: DataFrame, topk: int | None = None
) -> DataFrame:
    """Edge-level diff of two graph snapshots: per vertex
    (vid, n_added, n_removed, net) counting directed edges incident as
    SOURCE that appear only in the new (added) or only in the old
    (removed) snapshot — the ops report for a continuously re-derived
    link graph (which conversations gained/lost links between builds?;
    feeds alerting on derivation regressions and hub churn).

    Two keyed anti-joins (J3, co-partitioned on src when both snapshots
    share the store partitioning) + one union + ONE aggregate; vertices
    with no change are absent.  All-integer output; optional top-k by
    churn with (vid) tie-break for a deterministic frontier.
    """
    o = old_edges.select("src", "dst").distinct()
    n = new_edges.select("src", "dst").distinct()
    added = n.join(o, ["src", "dst"], "left_anti").select(
        F.col("src").alias("vid"), F.lit(1).alias("a"), F.lit(0).alias("r")
    )
    removed = o.join(n, ["src", "dst"], "left_anti").select(
        F.col("src").alias("vid"), F.lit(0).alias("a"), F.lit(1).alias("r")
    )
    out = (
        added.unionByName(removed)
        .groupBy("vid")
        .agg(
            F.sum("a").cast("long").alias("n_added"),
            F.sum("r").cast("long").alias("n_removed"),
        )
        .select(
            F.col("vid").cast("long").alias("vid"),
            "n_added",
            "n_removed",
            (F.col("n_added") - F.col("n_removed")).cast("long").alias("net"),
        )
    )
    if topk is not None:
        out = out.orderBy(
            (F.col("n_added") + F.col("n_removed")).desc(), F.col("vid").asc()
        ).limit(topk)
    return out


def knn_curve(graph: LinkGraph, round_to: int = 6) -> DataFrame:
    """Average-nearest-neighbor-degree curve k_nn(k): for each degree
    value k, (deg, n_vertices, mean_nn_deg) averaging over the vertices
    of degree k the mean degree of their neighbors — the resolution of
    assortativity into a curve (rising ⟹ assortative hubs-with-hubs,
    falling ⟹ disassortative hub-and-spoke; the single-number r is the
    slope-sign summary).

    One degree join onto the edge table (co-partitioned src side +
    \\|V\\|-row dst build), a per-vertex mean, then a per-degree-value
    mean — ≤ distinct-degree rows out.  Means are single divisions of
    exact sums, round-6.
    """
    deg = graph.degrees()
    e = graph.edges.select("src", "dst")
    dd = deg.select(F.col("vid").alias("dst"), F.col("deg").alias("dnbr"))
    per_v = (
        e.join(dd, "dst")
        .groupBy("src")
        .agg(F.sum("dnbr").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    du = deg.select(F.col("vid").alias("src"), "deg")
    return (
        per_v.join(du, "src")
        .groupBy(F.col("deg").cast("long").alias("deg"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.round(F.avg(F.col("s") / F.col("c")), round_to).alias("mean_nn_deg"),
        )
    )


def edge_audit(edges: DataFrame) -> DataFrame:
    """Data-quality audit of a raw directed edge table, one all-integer
    row: (n_rows, n_distinct, n_dup_rows, n_self_loops, n_asym) — the
    ingest gate every externally-supplied edge list should pass before
    graph construction (duplicate rows inflate weights silently;
    asymmetric pairs break the symmetric-closure preconditions of the
    undirected kernels; self-loops poison degree-based caps).
    n_asym counts directed non-loop edges whose reverse is absent.
    """
    e = edges.select("src", "dst")
    dist = e.distinct().persist()
    nl = dist.where(F.col("src") != F.col("dst"))
    t = nl.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    asym = nl.join(t, ["src", "dst"], "left_anti")
    out = (
        e.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .crossJoin(dist.agg(F.count(F.lit(1)).cast("long").alias("n_distinct")))
        .crossJoin(
            dist.where(F.col("src") == F.col("dst")).agg(
                F.count(F.lit(1)).cast("long").alias("n_self_loops")
            )
        )
        .crossJoin(asym.agg(F.count(F.lit(1)).cast("long").alias("n_asym")))
        .select(
            "n_rows",
            "n_distinct",
            (F.col("n_rows") - F.col("n_distinct")).cast("long").alias("n_dup_rows"),
            "n_self_loops",
            "n_asym",
        )
    )
    out = out.localCheckpoint(eager=True)
    dist.unpersist()
    return out


def degree_gini(graph: LinkGraph, round_to: int = 6) -> DataFrame:
    """Gini coefficient of the degree distribution, one row
    (n_vertices, total_deg, gini) — the attention-inequality number for
    a link graph (0 = regular, →1 = a few hubs own every edge), the
    single best early warning that hub mitigation (salting, caps) will
    matter downstream.

    Computed on the degree HISTOGRAM, not the vertex list: with tied
    values (v_k, c_k) sorted by v and C_k the cumulative count BEFORE
    block k,  Σ_i i·x_(i) = Σ_k v_k·(c_k·C_k + c_k(c_k+1)/2), so the
    rank window runs over ≤|distinct degrees| rows (a bounded dim, the
    zipf_fit argument) — never a |V|-row global sort.  All-integer sums
    into G = (2·Σi·x − (n+1)·Σx) / (n·Σx): ONE division + round.
    """
    from pyspark.sql import Window

    hist = graph.degrees().groupBy(F.col("deg").cast("long").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    blocks = hist.select(
        "v",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).cast("long").alias("cum_before"),
    )
    agg = blocks.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("long").alias("sx"),
        F.sum(
            F.col("v")
            * (
                F.col("c") * F.col("cum_before")
                + F.expr("c * (c + 1) DIV 2")
            )
        )
        .cast("long")
        .alias("six"),
    )
    return agg.select(
        F.col("n").alias("n_vertices"),
        F.col("sx").alias("total_deg"),
        F.round(
            (F.lit(2.0) * F.col("six") - (F.col("n") + 1).cast("double") * F.col("sx"))
            / (F.col("n").cast("double") * F.col("sx")),
            round_to,
        ).alias("gini"),
    )


def correlation_matrix(
    df: DataFrame, cols: list[str], round_to: int = 6
) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns: (col_a, col_b,
    corr) for every a < b pair — the EDA screen before any modeling on
    tabular facts.  ONE aggregate computes every moment (n, Σx, Σx²,
    Σxy for each pair) in a single scan — never one pass per pair — and
    each correlation is a closed-form expression of those exact sums
    (round-6).
    """
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast("double")).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c).cast("double") * F.col(c)).alias(f"ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast("double") * F.col(b)).alias(f"sp_{a}_{b}")
            )
    mom = df.agg(*aggs)
    rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            num = F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
            den = F.sqrt(
                (F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                * (F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
            )
            rows.append(
                mom.select(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(num / den, round_to).alias("corr"),
                )
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def clustering_by_degree(graph: LinkGraph, round_to: int = 6) -> DataFrame:
    """c(k) hierarchy curve: (deg, n_vertices, mean_lcc) — the mean
    local clustering coefficient of degree-k vertices, the standard
    companion to the k_nn(k) degree-correlation curve (`knn_curve`).
    A falling c(k) ~ k^-1 is the signature of hierarchical modularity;
    a flat one of ER-like mixing.

    Exactness: within a degree class every vertex shares the same
    k(k-1) denominator, so

        mean_lcc(k) = 2 · Σ_v tri(v) / (n_k · k · (k−1))

    is ONE division of exact integers (triangle counts and the class
    size), not an average of per-vertex doubles — no float-summation
    order sensitivity, so the round-6 value is engine-portable by
    construction.  Plan: the triangle-per-vertex table (wedge join +
    closing semi-join) left-joined to degrees, then one ≤max-degree-row
    aggregate.  deg < 2 classes are excluded (lcc undefined).
    """
    from linkgraph.algos.triangles import triangles_per_vertex

    deg = graph.degrees()
    tri = triangles_per_vertex(graph, by_degree=True)
    per = deg.join(tri, "vid", "left").select(
        F.col("deg").cast("long").alias("deg"),
        F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri"),
    )
    return (
        per.where(F.col("deg") >= 2)
        .groupBy("deg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.round(
                2.0
                * F.sum("tri").cast("double")
                / (
                    F.count(F.lit(1)).cast("double")
                    * (F.col("deg") * (F.col("deg") - 1)).cast("double")
                ),
                round_to,
            ).alias("mean_lcc"),
        )
    )


def clustering_agreement(
    x: DataFrame, y: DataFrame, round_to: int = 6
) -> DataFrame:
    """Adjusted Rand Index between two (vid, label) clusterings [Hubert &
    Arabie, J. Classif. 1985] — the pair-counting agreement the operator
    reads before trusting that two community methods (LPA vs CC vs
    Louvain) describe the same structure.

    Everything up to the final ratio is INTEGER: one co-partitioned join
    on vid, one contingency aggregate (n_ij per label pair — at most
    #clusters² rows, map-side combined), and C(n,2) sums per side.
    ARI = (index − E) / (max − E) with E = ab/C(n,2); the convention for
    the degenerate max == E case (both partitions trivial) is 1.0.
    Returns one row: (n_items, pairs_x, pairs_y, pairs_both, ari).
    """
    spark = x.sparkSession
    j = x.select("vid", F.col("label").alias("lx")).join(
        y.select("vid", F.col("label").alias("ly")), "vid"
    )

    def c2(col):
        return F.sum(F.col(col) * (F.col(col) - 1) / 2).cast("long")

    cont = j.groupBy("lx", "ly").agg(F.count(F.lit(1)).alias("nij"))
    both = int(cont.agg(c2("nij")).first()[0] or 0)
    ax = int(
        j.groupBy("lx").agg(F.count(F.lit(1)).alias("ni")).agg(c2("ni")).first()[0]
        or 0
    )
    by = int(
        j.groupBy("ly").agg(F.count(F.lit(1)).alias("nj")).agg(c2("nj")).first()[0]
        or 0
    )
    n = j.count()
    total = n * (n - 1) // 2
    e = ax * by / total if total else 0.0
    mx = (ax + by) / 2
    ari = 1.0 if mx == e else round((both - e) / (mx - e), round_to)
    return spark.createDataFrame(
        [(n, ax, by, both, ari)],
        "n_items long, pairs_x long, pairs_y long, pairs_both long, ari double",
    )


def strength_disparity(wedges: DataFrame, round_to: int = 6) -> DataFrame:
    """Weighted-degree strength and Barrat disparity per vertex:
    s_i = Σ_j w_ij and Y_i = Σ_j (w_ij / s_i)² [Barrat et al., PNAS'04].
    Y ≈ 1/deg means weight spreads evenly over neighbors; Y → 1 means
    one neighbor carries nearly all of it — the per-vertex "is this hub
    real or one dominant tie?" readout that global concentration
    measures (degree_gini) cannot localize.  Returns (vid, deg,
    strength, disparity, k_eff) with k_eff = 1/Y the effective neighbor
    count.  ONE aggregate over the weighted edge table (w and w² sum in
    the same pass; integer w keeps s exact)."""
    return (
        wedges.groupBy(F.col("src").alias("vid"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("deg"),
            F.sum("w").cast("long").alias("strength"),
            F.sum(F.col("w") * F.col("w")).cast("long").alias("w2"),
        )
        .select(
            "vid",
            "deg",
            "strength",
            F.round(
                F.col("w2") / (F.col("strength") * F.col("strength")).cast("double"),
                round_to,
            ).alias("disparity"),
            F.round(
                (F.col("strength") * F.col("strength")).cast("double") / F.col("w2"),
                round_to,
            ).alias("k_eff"),
        )
    )


def tie_strength_overlap(
    dedges: DataFrame, round_to: int = 6
) -> DataFrame:
    """Granovetter weak-tie test [AJS'73]: do STRONGER ties sit in
    denser neighborhoods?  Input is a DIRECTED multigraph-as-counts
    table (src, dst) rows with repetition; ties are symmetrized with
    weight w = total traversals both ways, and each tie (u < v) gets
    the neighborhood Jaccard |N(u)∩N(v)| / |N(u)∪N(v)| (endpoints
    excluded by construction: u ∉ N(u)).  Returns one row per weight
    value: (w, n_ties, mean_jaccard) — the embeddedness-vs-strength
    curve; weak ties bridging communities show low overlap.

    Plan: weight rollup (one shuffle), common-neighbor count via the
    neighbor-keyed self-join of the UNDIRECTED adjacency — cost is
    Σ_z deg(z)² wedge rows, the standard wedge budget (use on sparse
    derived graphs; the dense co-purchase projection wants the
    hub-capped linkpred machinery instead)."""
    und = (
        dedges.select("src", "dst")
        .union(dedges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    ties = und.where(F.col("src") < F.col("dst"))
    adj = und.select("src", "dst")  # distinct undirected adjacency
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    wedge = adj.select(F.col("dst").alias("z"), F.col("src").alias("a")).join(
        adj.select(F.col("dst").alias("z"), F.col("src").alias("b")), "z"
    ).where(F.col("a") < F.col("b"))
    common = wedge.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("cn")
    )
    scored = (
        ties.join(
            common,
            (ties["src"] == common["a"]) & (ties["dst"] == common["b"]),
            "left",
        )
        .join(deg.select(F.col("src").alias("u"), F.col("deg").alias("du")),
              ties["src"] == F.col("u"))
        .join(deg.select(F.col("src").alias("v"), F.col("deg").alias("dv")),
              ties["dst"] == F.col("v"))
        .select(
            "w",
            F.coalesce(F.col("cn"), F.lit(0)).alias("cn"),
            (F.col("du") + F.col("dv")).alias("dd"),
        )
    )
    # union excludes endpoints: u∈N(v) and v∈N(u) are IN deg but not in
    # the wedge commons; |N(u)∪N(v)\{u,v}| = du + dv - cn - 2
    jac = F.col("cn") / (F.col("dd") - F.col("cn") - 2).cast("double")
    return (
        scored.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ties"),
            F.round(
                F.avg(F.when(F.col("dd") - F.col("cn") - 2 > 0, jac).otherwise(0.0)),
                round_to,
            ).alias("mean_jaccard"),
        )
    )


def null_model_audit(graph: LinkGraph, round_to: int = 6) -> DataFrame:
    """Configuration-model null audit [Molloy-Reed '95; Newman SIREV'03]:
    ONE row comparing the observed graph against the degree-preserving
    random null —

      kappa        = ⟨k²⟩/⟨k⟩   (Molloy-Reed: giant component iff κ > 2)
      c_expected   = (⟨k²⟩−⟨k⟩)² / (n·⟨k⟩³)   (null-model transitivity)
      c_actual     = 3·triangles / wedges
      c_lift       = c_actual / c_expected — how much more clustered
                     than chance; the "is community structure real"
                     scalar that decides whether running Louvain is
                     even worth the shuffle.

    Numeric parity: every moment (s1 = Σd, s2 = Σd², wedges2 = Σd(d−1))
    is an EXACT integer sum — no float accumulates across rows, so both
    engines divide the identical longs and the doubles agree to the
    last bit; powers are written as explicit products (libm pow wobble,
    the benford lesson).  Plan: one |V|-row aggregate for the moments +
    the degree-ordered triangle count, crossJoined as 1-row tables —
    zero driver actions.  supercritical compares the ROUNDED kappa.
    """
    from linkgraph.algos.triangles import triangle_paths

    d = F.col("deg").cast("long")
    mom = graph.degrees().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d).cast("long").alias("s1"),
        F.sum(d * d).cast("long").alias("s2"),
        F.sum(d * (d - 1)).cast("long").alias("wedges2"),
    )
    tri = triangle_paths(graph, by_degree=True).agg(
        F.count(F.lit(1)).cast("long").alias("tri")
    )
    nd = F.col("n").cast("double")
    k1 = F.col("s1") / nd
    k2 = F.col("s2") / nd
    kappa = F.round(F.col("s2") / F.col("s1").cast("double"), round_to)
    c_exp = ((k2 - k1) * (k2 - k1)) / (nd * k1 * k1 * k1)
    c_act = F.lit(6.0) * F.col("tri") / F.col("wedges2").cast("double")
    return mom.crossJoin(tri).select(
        F.col("n").alias("n_vertices"),
        (F.col("s1") / 2).cast("long").alias("n_edges"),
        F.col("tri").alias("n_triangles"),
        kappa.alias("kappa"),
        (kappa > 2.0).cast("int").alias("supercritical"),
        F.round(c_exp, round_to).alias("c_expected"),
        F.round(c_act, round_to).alias("c_actual"),
        F.round(c_act / c_exp, round_to).alias("c_lift"),
    )
