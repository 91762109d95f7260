"""Edge derivation from transcripts and from the driver testdata tables.

SURVEY.md §2.1 S7/S8: conv—conv edges via shared tool/actor; turn-adjacency
edges under stable turn ordering (turn_idx, ts, row_number tie-break).

Scale notes (100 TB posture):
* Shared-key self-joins are quadratic per key — hub keys are capped/salted
  BEFORE the join (`hub_cap`), and AQE skew-join is on as backstop.
* `text` is never selected into any graph path — Catalyst column pruning
  keeps the heavy column out of every shuffle, which is what preserves the
  per-turn text-equality invariant for free (audited in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _spread_join_input(df: DataFrame, key: str) -> DataFrame:
    """Spread the shared-key self-join's PROBE input over
    `spark.sql.shuffle.partitions` partitions by full-row hash.

    Why: these self-joins EXPLODE (quadratic per key), but their INPUT is
    tiny after the distinct — AQE coalesces the pre-join stage by input
    bytes (measured: the whole zipf-graph pair explosion ran on ONE task,
    2.9s single-threaded, because the distinct key table compressed to
    <1 MB).  An explicit-count repartition is never coalesced, so the
    explosion gets full parallelism.  Hashing the FULL row (not just the
    join key) matters twice: the key alone can have far fewer distinct
    values than partitions (event_type ~5), and under a broadcast
    self-join the probe side needs no key clustering — full-row hash
    spreads even a single hub key's rows across every task
    (deterministic, so retries are safe; guide §2.5).  In the
    non-broadcast regime at cluster scale the planner adds its own
    key exchange after this one — a LINEAR extra pass over the distinct
    key table, noise next to the quadratic join it parallelizes."""
    p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(p, *[F.col(c) for c in df.columns])


def stable_turn_order(transcripts: DataFrame) -> DataFrame:
    """Stable total order of turns within a conversation (BASELINE input_hint).

    Ordering key: (turn_idx, ts) with a row_number tie-break — deterministic
    even if turn_idx collides.
    """
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").asc(), F.col("ts").asc_nulls_last()
    )
    return transcripts.withColumn("turn_rank", F.row_number().over(w))


def turn_adjacency_edges(transcripts: DataFrame) -> DataFrame:
    """S8: (conv:turn) -> (conv:turn+1) chain under stable ordering.

    Vertices are turn nodes encoded as struct(conv_id, turn_idx); callers
    relabel to dense vids via LinkGraph.  Window + lead — single shuffle on
    conv_id, no self-join.
    """
    ordered = stable_turn_order(transcripts)
    w = Window.partitionBy("conv_id").orderBy("turn_rank")
    return (
        ordered.withColumn("next_turn_idx", F.lead("turn_idx").over(w))
        .where(F.col("next_turn_idx").isNotNull())
        .select(
            F.col("conv_id"),
            F.col("turn_idx").alias("src_turn"),
            F.col("next_turn_idx").alias("dst_turn"),
        )
    )


def suggest_hub_cap(
    transcripts: DataFrame, key: str = "tool", quantile: float = 0.999
) -> int:
    """Sketch-based hub-cap planning (SURVEY.md A8): per-key conversation
    cardinality via approx_count_distinct (HLL) and the cap as an
    approximate quantile of that distribution — at 10^12 rows the stats
    scan itself must be a sketch, never an exact count-distinct + sort.
    """
    per_key = (
        transcripts.where(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.approx_count_distinct("conv_id").alias("n_convs"))
    )
    row = per_key.agg(
        F.percentile_approx("n_convs", quantile).alias("cap")
    ).first()
    return max(int(row["cap"] or 1), 1)


def shared_key_conv_edges(
    transcripts: DataFrame,
    key: str = "tool",
    hub_cap: int | None = None,
) -> DataFrame:
    """S7: conv—conv edge when two conversations share a non-null `key`
    (tool or actor/role).  Canonical orientation src < dst, distinct.

    hub_cap: keys touching more than this many conversations are dropped
    before the self-join (a tool shared by 10^5 convs ⇒ 10^10 pairs at
    10^12-turn scale — hub tools carry no signal and quadratic cost).
    The cap is part of the operator's documented semantics, applied
    identically in oracles.
    """
    ck = (
        transcripts.where(F.col(key).isNotNull())
        .select(F.col("conv_id"), F.col(key).alias("k"))
        .distinct()
    )
    if hub_cap is not None:
        deg = ck.groupBy("k").agg(F.count("*").alias("n_convs"))
        ck = ck.join(F.broadcast(deg.where(F.col("n_convs") <= hub_cap)), "k", "left_semi")
    ck = _spread_join_input(ck, "k")
    a, b = ck.alias("a"), ck.alias("b")
    return (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.conv_id") < F.col("b.conv_id")))
        .select(F.col("a.conv_id").alias("src_conv"), F.col("b.conv_id").alias("dst_conv"))
        .distinct()
    )


# ------------------------------------------------------------- testdata graphs
def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """g_copurchase: part—part edges for parts in the same order (FIXTURES.md A).

    Shared-key self-join (S7 analog) on l_orderkey; symmetric directed output.
    """
    pk = lineitem.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    pk = _spread_join_input(pk, "k")
    a, b = pk.alias("a"), pk.alias("b")
    return (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.p") != F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )


def copurchase_weighted_edges(lineitem: DataFrame) -> DataFrame:
    """g_copurchase with an integer weight: (src, dst, w) where w = number
    of distinct orders the two parts co-occur in.  Same self-join shape as
    `copurchase_edges` with the distinct replaced by a count aggregate
    (identical shuffle profile); symmetric directed output, w symmetric by
    construction.  Integer weights keep downstream shortest-path state
    exactly hash-comparable across engines.
    """
    pk = lineitem.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    pk = _spread_join_input(pk, "k")
    a, b = pk.alias("a"), pk.alias("b")
    return (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.p") != F.col("b.p")))
        .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


def cust_supp_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """g_cust_supp: bipartite customer—supplier edges via orders⋈lineitem.

    Vertex encoding shared with the DuckDB oracle: customer -> 2*key,
    supplier -> 2*key+1.  Symmetric directed output.
    """
    pairs = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    rev = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    return fwd.union(rev)


def events_user_edges(events: DataFrame) -> DataFrame:
    """g_events_user: user—user edges sharing an event_type (skewed S7 analog)."""
    uk = events.select(F.col("event_type").alias("k"), F.col("user_id").alias("u")).distinct()
    uk = _spread_join_input(uk, "k")
    a, b = uk.alias("a"), uk.alias("b")
    return (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.u") != F.col("b.u")))
        .select(F.col("a.u").alias("src"), F.col("b.u").alias("dst"))
        .distinct()
    )


def events_adjacency(events: DataFrame) -> DataFrame:
    """g_events_adj: per-user consecutive event_type transitions (S8 analog).

    Stable ordering (ts, event_id); output (src_type, dst_type, cnt).
    """
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        events.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src_type"), F.col("next_type").alias("dst_type")
        )
        .agg(F.count("*").alias("cnt"))
    )


def sequential_copurchase_edges(
    lineitem: DataFrame, keep_multiplicity: bool = False
) -> DataFrame:
    """DIRECTED part→part edges: within each order, linenumber i's part
    points at linenumber i+1's part (S8-shaped: one window on a stable
    per-order sort, no self-join).  Different orders traverse parts in
    different sequences, so the union develops real directed cycles —
    the fixture the SCC kernel needs, derived purely relationally.

    ``keep_multiplicity=True`` keeps repeated (src, dst) transitions —
    the multigraph-as-rows shape tie-strength analyses weight by."""
    # (l_linenumber, l_partkey): l_linenumber alone is NOT unique per
    # order in the fixture data, and a tied sort key makes the LEAD
    # sequence engine/partitioning-dependent; adding l_partkey gives a
    # strict total order (full ties are identical rows, whose swap
    # leaves the edge set unchanged)
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_linenumber").asc(), F.col("l_partkey").asc()
    )
    out = (
        lineitem.select("l_orderkey", "l_linenumber", "l_partkey")
        .withColumn("nxt", F.lead("l_partkey").over(w))
        .where(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("l_partkey")))
        .select(F.col("l_partkey").alias("src"), F.col("nxt").alias("dst"))
    )
    return out if keep_multiplicity else out.distinct()


def sequential_copurchase_times(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Sequential co-purchase transitions with FIRST-FORMATION times:
    (src, dst, t) where t = min o_orderdate over orders containing the
    directed transition — the timestamped edge table temporal-graph
    operators (triadic closure, temporal reach) consume.  Same strict
    per-order total order as sequential_copurchase_edges; the orderkey
    join is fact-fact on the orders key, then one min-rollup per edge."""
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_linenumber").asc(), F.col("l_partkey").asc()
    )
    trans = (
        lineitem.select("l_orderkey", "l_linenumber", "l_partkey")
        .withColumn("nxt", F.lead("l_partkey").over(w))
        .where(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("l_partkey")))
        .select(
            "l_orderkey",
            F.col("l_partkey").alias("src"),
            F.col("nxt").alias("dst"),
        )
    )
    return (
        trans.join(
            orders.select("o_orderkey", "o_orderdate"),
            trans["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("src", "dst")
        .agg(F.min("o_orderdate").alias("t"))
    )


def edge_pmi(weighted_edges: DataFrame, round_to: int = 6) -> DataFrame:
    """Pointwise-mutual-information reweighting of a co-occurrence edge
    table (src, dst, w):

        pmi(u,v) = ln( w_uv · T / (s_u · s_v) ),   s_u = Σ_x w_ux,
        T = Σ w

    — the standard association-strength correction before thresholding
    a co-occurrence graph (raw counts rank hub pairs first purely
    because hubs co-occur with everything; PMI asks "more than chance?").
    Word-graph / product-graph building's default edge weight
    [Church & Hanks 1990, public formulation].

    One |V|-row strength aggregate joined back onto the edge table
    (co-partitioned on src; the dst side is the same broadcastable
    strength dim), T a bounded scalar; ln + ONE division + round-6 —
    the usual portability argument.  Returns (src, dst, w, pmi).
    """
    e = weighted_edges.select("src", "dst", "w")
    strength = e.groupBy("src").agg(F.sum("w").alias("s"))
    total = int(e.agg(F.sum("w")).first()[0] or 0)
    if total == 0:
        return e.sparkSession.createDataFrame(
            [], "src long, dst long, w long, pmi double"
        )
    su = strength.select(F.col("src"), F.col("s").alias("su"))
    sv = strength.select(F.col("src").alias("dst"), F.col("s").alias("sv"))
    return (
        e.join(su, "src")
        .join(sv, "dst")
        .select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("w").cast("long"),
            F.round(
                F.log(
                    F.col("w")
                    * F.lit(float(total))
                    / (F.col("su").cast("double") * F.col("sv"))
                ),
                round_to,
            ).alias("pmi"),
        )
    )


def frequent_triples(
    lineitem: DataFrame,
    min_support: int = 2,
    basket_cap: int = 32,
    topk: int | None = None,
) -> DataFrame:
    """Frequent 3-itemsets over the order baskets: (p1, p2, p3, support)
    with p1 < p2 < p3 and support = number of distinct orders containing
    all three parts — the A-priori step up from the pairwise co-purchase
    derivation (S7), the classic market-basket / template-co-occurrence
    miner.

    Scale posture: triple fanout per basket is C(n,3), so baskets larger
    than `basket_cap` items are dropped whole (the standard basket cap —
    a 10⁴-item basket is a crawler artifact, not a purchase; the cap is
    the operator contract, oracle-mirrored).  The enumeration is two
    self-joins co-partitioned on the order key with p1<p2<p3 canonical
    ordering, then ONE count aggregate; at corpus scale add the A-priori
    frequent-pair prune in front (the pair table is `copurchase_weighted_
    edges` filtered to w ≥ min_support) — the cap alone bounds this
    fixture's fanout.  All-integer output; optional deterministic top-k.
    """
    pk = lineitem.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    sizes = pk.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    pk = pk.join(sizes.where(F.col("n") <= basket_cap).select("k"), "k")
    a, b, c = pk.alias("a"), pk.alias("b"), pk.alias("c")
    out = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.p") < F.col("b.p")))
        .join(c, (F.col("a.k") == F.col("c.k")) & (F.col("b.p") < F.col("c.p")))
        .groupBy(
            F.col("a.p").alias("p1"),
            F.col("b.p").alias("p2"),
            F.col("c.p").alias("p3"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= min_support)
        .select(
            F.col("p1").cast("long"),
            F.col("p2").cast("long"),
            F.col("p3").cast("long"),
            "support",
        )
    )
    if topk is not None:
        out = out.orderBy(
            F.col("support").desc(),
            F.col("p1").asc(),
            F.col("p2").asc(),
            F.col("p3").asc(),
        ).limit(topk)
    return out
