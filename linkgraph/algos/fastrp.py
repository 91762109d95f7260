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

from pyspark.sql import DataFrame, functions as F


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
