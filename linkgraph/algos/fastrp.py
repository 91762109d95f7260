"""FastRP node embeddings — very sparse random projection + iterated
neighbor aggregation [FastRP, Chen & Sultan & Tian & Skiena, CIKM'19].

Spark-first shape: the seed matrix R is a PROJECTION on the vertex
table (one hash expression per dimension, no state, no shuffle), and
each propagation hop A·h is ONE frontier-expand edge join
(``LinkGraph.expand``, the same J1 strategy dispatch MS-BFS and
PageRank ride) followed by a d-column integer SUM aggregation — d sums
fuse into one map-side-combinable aggregate, so a hop costs exactly one
|E|-row shuffle regardless of d.  Nothing here is new physical
machinery; FastRP is PageRank's plan shape with a wider payload.

Exactness contract (what makes the driver oracle hash-green): the seed
is a portable md5 hash mapped to {+1, -1, 0} and every propagation hop
is pure int64 arithmetic, so all intermediates are EXACT and
engine-independent.  Floats appear only in the final row-local L2
normalization — sqrt and divide of already-exact integers, which are
correctly-rounded IEEE ops both engines reproduce bit for bit (then
rounded to 9 dp for belt and braces).  Classic FastRP damps each hop by
D^{-1} (or deg^beta); the integer variant keeps the A^k moments
un-normalized and folds magnitude into the final per-row norm, trading
per-hop damping for cross-engine bit-exactness.  At cluster scale the
damping affects embedding quality, not the plan: swapping ``F.sum(x)``
for ``F.sum(x)/deg`` (floats, same joins) is a one-line variant and the
plan is identical.

Overflow posture: hop k holds |A^k R| entries bounded by (max in-degree)^k;
with ±1 seeds and the default 2 hops the int64 budget tolerates
in-degrees up to ~3·10^9 — beyond any real graph's hub — so the integer
lane never silently wraps at 10^12-turn scale.

Scale posture: state is |V| rows × (d+1) int64 columns; the accumulator
merge is a vid-keyed join (co-partitioned with the aggregation output,
no extra shuffle under AQE); the output feeds the ANN stack
(textops/simsearch) directly via ``as_embedding_vectors``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _seed_expr(j: int, hash_mode: str, density_inv: int):
    """Seed entry R[v, j] ∈ {+1, -1, 0}: P(±1) = 1/(2s) each with
    s = density_inv (the "very sparse" projection of Achlioptas/Li).

    portable: 60-bit md5 (DuckDB-reproducible, positive so %/pmod
    agree); fast: xxhash64 via pmod.
    """
    key = f"concat(cast(vid as string), '#frp#{j}')"
    if hash_mode in ("md5", "portable"):
        h = f"cast(conv(substring(md5({key}), 1, 15), 16, 10) as bigint)"
    else:
        h = f"xxhash64({key})"
    m = 2 * density_inv
    return F.expr(
        f"case pmod({h}, {m}) when 0 then 1L when 1 then -1L else 0L end"
    )


def fastrp_embeddings(
    graph,
    dims: int = 8,
    weights: tuple[int, ...] = (1, 2),
    hash_mode: str = "xxhash64",
    density_inv: int = 2,
    normalize: bool = True,
    est_rows: int | None = None,
) -> DataFrame:
    """Returns (vid, e0..e{dims-1}) — FastRP embedding, one double column
    per dimension (use ``as_embedding_vectors`` to pack for the ANN stack).

    weights[k] is the integer mix weight of the (k+1)-hop moment A^{k+1}R;
    len(weights) = number of propagation hops.  With ``normalize`` the
    row is L2-normalized (zero rows stay zero), which is what cosine-based
    downstream consumers (ann_cosine_topk, ivf index) expect.
    """
    if dims < 1:
        raise ValueError("fastrp_embeddings needs dims >= 1")
    if not weights:
        raise ValueError("fastrp_embeddings needs at least one hop weight")
    xs = [f"x{j}" for j in range(dims)]
    verts = graph.degrees().select("vid")
    if est_rows is None:
        est_rows = verts.count()
    state = verts.select(
        "vid", *[_seed_expr(j, hash_mode, density_inv).alias(x) for j, x in enumerate(xs)]
    )
    acc = None
    for w in weights:
        msgs = state.select(F.col("vid").alias("src"), *xs)
        hop = (
            graph.expand(msgs, est_rows=est_rows)
            .groupBy("dst")
            .agg(*[F.sum(x).alias(x) for x in xs])
            .select(F.col("dst").alias("vid"), *xs)
        )
        # vertices with no in-edges this hop re-enter as zero rows so the
        # next hop (and the final output) stays defined over all of V
        state = verts.join(hop, "vid", "left").select(
            "vid", *[F.coalesce(F.col(x), F.lit(0)).cast("long").alias(x) for x in xs]
        )
        contrib = state.select(
            "vid", *[(F.lit(int(w)) * F.col(x)).alias(x) for x in xs]
        )
        if acc is None:
            acc = contrib
        else:
            a, b = acc.alias("a"), contrib.alias("b")
            acc = a.join(b, "vid").select(
                "vid",
                *[(F.col(f"a.{x}") + F.col(f"b.{x}")).alias(x) for x in xs],
            )
    if not normalize:
        return acc
    sq = None
    for x in xs:
        term = (F.col(x) * F.col(x)).cast("double")
        sq = term if sq is None else sq + term
    nn = F.sqrt(sq)
    return acc.select(
        "vid",
        *[
            F.when(nn > 0, F.col(x).cast("double") / nn)
            .otherwise(F.lit(0.0))
            .alias(f"e{j}")
            for j, x in enumerate(xs)
        ],
    )


def as_embedding_vectors(emb: DataFrame, id_out: str = "vec_id") -> DataFrame:
    """Pack wide FastRP output into (vec_id, embedding: array<float>) —
    the schema the ANN operators (simsearch) consume."""
    dims = [c for c in emb.columns if c.startswith("e")]
    return emb.select(
        F.col("vid").alias(id_out),
        F.array(*[F.col(c).cast("float") for c in dims]).alias("embedding"),
    )


def embedding_link_auc(
    graph: LinkGraph, emb: DataFrame, dims: int, k: int = 200, salt: str = "auc"
) -> DataFrame:
    """Link-prediction AUC of a node embedding: do embedding dot
    products rank the graph's own edges above non-edges?  The
    does-it-reconstruct-the-graph eval a GNN pipeline runs before
    training on an embedding.  Returns one row (n_pos, n_neg, auc).

    Sampling is deterministic end to end (portable-md5 orders with vid
    tiebreaks, mirrored by the SQL oracle): positives = the k
    lowest-hashed canonical edges; negatives = consecutive pairs of the
    2k lowest-hashed vertices, anti-joined against the edge table.  AUC
    is the exact mean pairwise indicator (ties scored 0.5) over the
    bounded |pos|×|neg| cross join — broadcast nested loop, ≤k² rows
    regardless of graph size; no global structure is ever sorted beyond
    the two TakeOrdered samples.

    Note the null calibration: on an unstructured (near-random) graph
    the true AUC is ~0.5 — the metric reads structure, it does not
    invent it (the sf fixtures' sequential co-purchase graph is such a
    null; the two-clique unit fixture pins the structured case high).
    """
    from linkgraph.textops.dedup import portable_hash60

    emb = emb.select(
        "vid", *[F.round(F.col(f"e{j}"), 9).alias(f"e{j}") for j in range(dims)]
    )
    und = graph.edges.where(F.col("src") < F.col("dst")).select("src", "dst")
    hp = portable_hash60(
        F.concat(
            F.col("src").cast("string"),
            F.lit("#"),
            F.col("dst").cast("string"),
            F.lit("#" + salt),
        )
    )
    pos = und.orderBy(hp.asc(), F.col("src").asc(), F.col("dst").asc()).limit(k)
    hv = portable_hash60(
        F.concat(F.col("vid").cast("string"), F.lit("#" + salt + "neg"))
    )
    verts = (
        emb.select("vid", hv.alias("h"))
        .orderBy(F.col("h").asc(), F.col("vid").asc())
        .limit(2 * k)
    )
    # bounded 2k-row table: the no-partition row_number window is fine
    vr = verts.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.col("h").asc(), F.col("vid").asc())),
    )
    aa = vr.where(F.col("rn") % 2 == 1).select(
        F.col("vid").alias("u"), ((F.col("rn") + 1) / 2).cast("long").alias("p")
    )
    bb = vr.where(F.col("rn") % 2 == 0).select(
        F.col("vid").alias("v"), (F.col("rn") / 2).cast("long").alias("p")
    )
    cand = aa.join(bb, "p").select(
        F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst")
    )
    neg = cand.join(und, ["src", "dst"], "left_anti")

    eu = emb.select(
        F.col("vid").alias("src"),
        *[F.col(f"e{j}").alias(f"a{j}") for j in range(dims)],
    )
    ev = emb.select(
        F.col("vid").alias("dst"),
        *[F.col(f"e{j}").alias(f"b{j}") for j in range(dims)],
    )

    def dot(df, out):
        s = df.join(eu, "src").join(ev, "dst")
        expr = None
        for j in range(dims):
            t = F.col(f"a{j}") * F.col(f"b{j}")
            expr = t if expr is None else expr + t
        return s.select(expr.alias(out))

    ps = dot(pos, "sp")
    ns = dot(neg, "sn")
    np_ = ps.agg(F.count(F.lit(1)).cast("long").alias("n_pos"))
    nn_ = ns.agg(F.count(F.lit(1)).cast("long").alias("n_neg"))
    # both sides are ≤k rows; broadcasting one turns the cartesian into
    # a single-stage BroadcastNestedLoopJoin instead of a P²-task product
    auc = ps.crossJoin(F.broadcast(ns)).agg(
        F.round(
            F.avg(
                F.when(F.col("sp") > F.col("sn"), 1.0)
                .when(F.col("sp") == F.col("sn"), 0.5)
                .otherwise(0.0)
            ),
            6,
        ).alias("auc")
    )
    return np_.crossJoin(nn_).crossJoin(auc)
