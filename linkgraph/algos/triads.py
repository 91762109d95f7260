"""Directed triad census — the Holland-Leinhardt 16-class motif profile
[HL70; Batagelj & Mrvar, "A subquadratic triad census algorithm", Social
Networks 23 (2001)], distributed.

The 64 possible directed-edge configurations of an ordered triple
("tricodes") collapse onto 16 isomorphism classes.  The code→class table
is GENERATED at import by canonicalizing every code over the 6 vertex
permutations against the 16 standard exemplars (statnet's patterns) —
no hand-derived table to get wrong; `tests/test_triads.py` re-verifies
the census against a from-scratch brute-force classifier.

Distributed shape (the Batagelj-Mrvar decomposition):

* triads with ≥2 connected dyads are exactly the triples covered by a
  WEDGE of the undirected support graph: one self-join of the support
  adjacency on the center vertex (the same cost envelope as triangle
  counting — at scale, degree-capped hubs bound the wedge blow-up),
  deduped to canonical (a<b<c), then 3 dyad-state lookups and ONE
  64-entry array index give the class.  No 6-way edge join.
* triads with exactly one connected dyad (012, 102) come from per-dyad
  algebra: (n-2) third vertices minus the support-neighborhood union
  |N'(u) ∪ N'(v)| = deg(u)+deg(v)-2-cn(u,v), with cn(u,v) the common-
  neighbor count — one more wedge aggregate, co-partitioned.
* 003 is C(n,3) minus everything else: never enumerated.

So the full census costs two wedge-shaped shuffles + one dyad table —
subquadratic in triples, exactly the paper's point, and every step is a
plain DataFrame aggregate.
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# statnet's canonical patterns on vertices (0, 1, 2)
_EXEMPLARS = {
    "003": [],
    "012": [(0, 1)],
    "102": [(0, 1), (1, 0)],
    "021D": [(1, 0), (1, 2)],
    "021U": [(0, 1), (2, 1)],
    "021C": [(0, 1), (1, 2)],
    "111D": [(0, 1), (1, 0), (2, 0)],
    "111U": [(0, 1), (1, 0), (0, 2)],
    "030T": [(0, 1), (2, 1), (0, 2)],
    "030C": [(1, 0), (2, 1), (0, 2)],
    "201": [(0, 1), (1, 0), (0, 2), (2, 0)],
    "120D": [(1, 0), (1, 2), (0, 2), (2, 0)],
    "120U": [(0, 1), (2, 1), (0, 2), (2, 0)],
    "120C": [(0, 1), (1, 2), (0, 2), (2, 0)],
    "210": [(0, 1), (1, 2), (2, 1), (0, 2), (2, 0)],
    "300": [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)],
}

# bit position of directed edge (i, j) in the tricode, for the ordered
# pairs (0,1),(1,0),(0,2),(2,0),(1,2),(2,1)
_BIT = {(0, 1): 1, (1, 0): 2, (0, 2): 4, (2, 0): 8, (1, 2): 16, (2, 1): 32}


def _code(edges) -> int:
    return sum(_BIT[e] for e in edges)


def _canon(code: int) -> int:
    best = 63
    for p in permutations(range(3)):
        c = 0
        for (i, j), b in _BIT.items():
            if code & _BIT[(i, j)]:
                c |= _BIT[(p[i], p[j])]
        best = min(best, c)
    return best


def _build_lut() -> list[str]:
    by_canon = {_canon(_code(e)): name for name, e in _EXEMPLARS.items()}
    assert len(by_canon) == 16, "exemplars must cover all 16 classes"
    return [by_canon[_canon(c)] for c in range(64)]

TRICODE_CLASS = _build_lut()

TRIAD_CLASSES = list(_EXEMPLARS.keys())


def triad_census(edges: DataFrame) -> DataFrame:
    """(klass, cnt) over all C(n,3) vertex triples of the directed graph
    (self-loops dropped, duplicate edges collapsed); all 16 classes are
    emitted, zeros included."""
    spark = edges.sparkSession
    e = (
        edges.select(
            F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # dyad states on canonical u<v pairs: bit1 = u->v, bit2 = v->u
    dy = (
        e.select(
            F.least("u", "v").alias("a"),
            F.greatest("u", "v").alias("b"),
            F.when(F.col("u") < F.col("v"), 1).otherwise(2).alias("bit"),
        )
        .groupBy("a", "b")
        .agg(F.sum(F.col("bit")).alias("st"))
        # duplicate directions collapse: sum of distinct bits is exact
        .localCheckpoint(eager=True)
    )
    verts = e.select(F.col("u").alias("vid")).union(
        e.select(F.col("v").alias("vid"))
    ).distinct()
    n = verts.count()

    nb = dy.select(F.col("a").alias("x"), F.col("b").alias("y")).unionByName(
        dy.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    # ---- candidate triples: every triple covered by a support wedge
    wedges = (
        nb.alias("l")
        .join(nb.alias("r"), "x")
        .where(F.col("l.y") < F.col("r.y"))
        .select(F.col("x"), F.col("l.y").alias("p"), F.col("r.y").alias("q"))
    )
    triples = wedges.select(
        F.least("x", "p", "q").alias("a"),
        F.expr("array_sort(array(x, p, q))")[1].alias("b"),
        F.greatest("x", "p", "q").alias("c"),
    ).distinct()

    def dstate(u, v, alias):
        return dy.select(
            F.col("a").alias(u), F.col("b").alias(v), F.col("st").alias(alias)
        )

    coded = (
        triples.join(dstate("a", "b", "sab"), ["a", "b"], "left")
        .join(dstate("a", "c", "sac"), ["a", "c"], "left")
        .join(dstate("b", "c", "sbc"), ["b", "c"], "left")
        .select(
            (
                F.coalesce("sab", F.lit(0))
                + F.coalesce("sac", F.lit(0)) * 4
                + F.coalesce("sbc", F.lit(0)) * 16
            ).alias("code")
        )
    )
    lut = F.array(*[F.lit(c) for c in TRICODE_CLASS])
    connected = (
        coded.select(F.element_at(lut, F.col("code").cast("int") + 1).alias("klass"))
        .groupBy("klass")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    # ---- single-dyad classes: (n-2) - |N'(u) ∪ N'(v)| per connected dyad
    degs = nb.groupBy("x").agg(F.count(F.lit(1)).alias("deg"))
    cn = (
        wedges.join(
            dy.select(F.col("a").alias("p"), F.col("b").alias("q")), ["p", "q"],
            "left_semi",
        )
        .groupBy("p", "q")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    lone = (
        dy.join(cn, (dy["a"] == cn["p"]) & (dy["b"] == cn["q"]), "left")
        .join(degs.select(F.col("x").alias("a"), F.col("deg").alias("da")), "a")
        .join(degs.select(F.col("x").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            F.when(F.col("st") == 3, F.lit("102")).otherwise(F.lit("012")).alias(
                "klass"
            ),
            (
                F.lit(n - 2)
                - (
                    F.col("da")
                    + F.col("db")
                    - 2
                    - F.coalesce(F.col("cn"), F.lit(0))
                )
            ).alias("k"),
        )
        .groupBy("klass")
        .agg(F.sum("k").alias("cnt"))
    )

    partial = connected.unionByName(lone)
    counted = partial.agg(F.sum("cnt")).first()[0] or 0
    total = n * (n - 1) * (n - 2) // 6
    empty = spark.createDataFrame(
        [("003", int(total - counted))], "klass string, cnt long"
    )
    all_classes = spark.createDataFrame(
        [(c,) for c in TRIAD_CLASSES], "klass string"
    )
    return (
        all_classes.join(
            partial.unionByName(empty), "klass", "left"
        )
        .select(
            "klass", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
        )
    )
