"""Approximate vertex similarity via neighborhood MinHash + banded LSH.

`vertex_similarity` (linkpred.py) enumerates wedges exactly — right for
top-k answers but its cost is sum-over-centers deg² even hub-capped.
This module is the sketch path a 100 TB graph needs when the ask is
"ALL vertex pairs with neighborhood Jaccard >= t": MinHash each
vertex's adjacency set, band the signatures (the document-LSH machinery
of textops/dedup.py, applied to the graph itself), and exact-verify
only the banded candidates.

Scale shape:
* signatures: one groupBy(min...) over the edge table — LINEAR in |E|
  (min is algebraic: partial map-side combine, the shuffle carries one
  partial signature per (partition, vertex)), vs the wedge join's
  sum-deg² rows.  No hub cap needed;
* banding: a projection + explode of b band structs, one hash
  aggregate self-join on (band, bucket) — identical shape to MinHash
  document LSH, so the same guarantees: candidates ~ pairs colliding
  in >= 1 band, P[cand] = 1-(1-j^r)^b;
* exact verify joins ONLY candidate pairs' adjacency lists (semi-join
  pattern), never all pairs.

Portability: the hash family is portable_hash60 (md5-derived, engine-
identical — `textops/dedup.py`), band buckets are the ordered '_'-joined
signature slice exactly as the minhash_lsh oracle strings them, so a
DuckDB oracle reproduces candidates AND verdicts bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.textops.dedup import portable_hash60


def neighborhood_minhash_pairs(
    edges: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.4,
    round_to: int = 6,
) -> DataFrame:
    """(a, b, jac) for banded candidate pairs with exact neighborhood
    Jaccard >= threshold; a < b, ordered (a, b).

    `edges`: directed symmetric (src, dst) — the neighborhood of v is
    its out-set, which equals its undirected neighborhood on the
    symmetric-closure tables the derivations in sources/derive.py emit.
    """
    if num_hashes % bands:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    r = num_hashes // bands
    nbr = edges.select("src", "dst").distinct()
    key = F.col("dst").cast("string")
    sig = nbr.groupBy("src").agg(
        *[
            F.min(portable_hash60(key, seed=i)).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_", *[F.col(f"h{b * r + j}").cast("string") for j in range(r)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "src", F.explode(F.array(*band_structs)).alias("bb")
    ).select("src", "bb.band", "bb.bucket")
    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.src") < F.col("y.src")),
        )
        .select(F.col("x.src").alias("a"), F.col("y.src").alias("b"))
        .distinct()
    )
    sizes = nbr.groupBy("src").agg(F.count(F.lit(1)).alias("sz"))
    ta, tb = nbr.alias("ta"), nbr.alias("tb")
    inter = (
        cand.join(ta, F.col("ta.src") == F.col("a"))
        .join(
            tb,
            (F.col("tb.src") == F.col("b")) & (F.col("tb.dst") == F.col("ta.dst")),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("i").cast("double") / (F.col("sa.sz") + F.col("sb.sz") - F.col("i"))
    # `inter` already carries one row per candidate pair (i >= 1; pairs
    # with an empty intersection can't pass a positive threshold), so no
    # re-join against `cand` — re-joining a frame against its own
    # descendant trips Spark's ambiguous-self-join resolution
    return (
        inter.join(sa, F.col("sa.src") == F.col("a"))
        .join(sb, F.col("sb.src") == F.col("b"))
        .where(jac >= F.lit(threshold))
        .select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.round(jac, round_to).alias("jac"),
        )
        .orderBy("a", "b")
    )
