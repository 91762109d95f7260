"""Item-item collaborative filtering over co-occurrence baskets — the
classic "customers who bought X also bought Y" recommender, composed
from the same basket table the co-purchase graph derives from.

Two stages, each with an explicit scale bound:

* `item_item_cosine` — bipartite cosine similarity
  sim(i,j) = n_ij / sqrt(n_i * n_j) over basket co-occurrence.  Pair
  generation is a basket self-join CAPPED at `basket_cap` items per
  basket (quadratic in basket size, so the cap bounds the blow-up at
  B·cap² pairs; mega-baskets are bot/ETL artifacts, the cap is the
  documented knob).  Item frequencies n_i come from the UNCAPPED table
  (the cap prunes pair generation, not the norm).  Map-side-combined
  groupBy on (i, j); no all-pairs anywhere.

* `recommend_topk` — score(u, i) = Σ_{j ∈ basket(u)} sim(j, i) over the
  user's basket joined to the similarity table (co-partitioned on the
  item key), already-owned items removed with a left-anti join, then a
  per-user WindowGroupLimit top-k.  Ordering ties break on
  (round(score, 9) DESC, item ASC) — the ROUNDED score is the sort key
  in BOTH engines, so rank boundaries are engine-portable.

At transcript scale the same shape serves "conversations like this one":
baskets = conversations, items = tools/actors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def item_item_cosine(
    baskets: DataFrame,
    basket_col: str = "k",
    item_col: str = "p",
    basket_cap: int = 64,
) -> DataFrame:
    """(i, j, sim) for i != j, both directions, from (basket, item) pairs."""
    pk = baskets.select(
        F.col(basket_col).alias("k"), F.col(item_col).alias("p")
    ).distinct()
    ni = pk.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    small = pk.join(
        pk.groupBy("k")
        .agg(F.count(F.lit(1)).alias("bs"))
        .where(F.col("bs") <= basket_cap)
        .select("k"),
        "k",
    )
    co = (
        small.alias("a")
        .join(small.alias("b"), "k")
        .where(F.col("a.p") < F.col("b.p"))
        .groupBy(F.col("a.p").alias("i"), F.col("b.p").alias("j"))
        .agg(F.count(F.lit(1)).alias("nij"))
    )
    sim = (
        co.join(ni.select(F.col("p").alias("i"), F.col("n").alias("ni")), "i")
        .join(ni.select(F.col("p").alias("j"), F.col("n").alias("nj")), "j")
        .select(
            "i",
            "j",
            (F.col("nij") / F.sqrt(F.col("ni") * F.col("nj"))).alias("sim"),
        )
    )
    return sim.unionByName(
        sim.select(F.col("j").alias("i"), F.col("i").alias("j"), "sim")
    )


def recommend_topk(
    user_items: DataFrame,
    sim: DataFrame,
    k: int = 5,
    user_col: str = "u",
    item_col: str = "p",
) -> DataFrame:
    """(u, rec, score, rk): top-k unowned items per user by summed
    similarity to the user's basket."""
    ub = user_items.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("j")
    ).distinct()
    scores = (
        ub.join(sim.select(F.col("i").alias("j"), F.col("j").alias("rec"), "sim"), "j")
        .groupBy("u", "rec")
        .agg(F.round(F.sum("sim"), 9).alias("score"))
        .join(
            ub.select("u", F.col("j").alias("rec")),
            ["u", "rec"],
            "left_anti",
        )
    )
    w = Window.partitionBy("u").orderBy(F.col("score").desc(), F.col("rec").asc())
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("u", "rec", "score", "rk")
    )
