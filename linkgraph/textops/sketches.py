"""Fixed-size frequency/membership sketches: count-min and Bloom.

Both are the *mergeable-summary* shape a 100 TB corpus needs: the sketch
state is a constant-size counter/bit table (depth×width longs, m bits)
that map-side partial aggregation merges for free, while the exact
equivalents (full token groupBy, full digest anti-join) shuffle data
proportional to the corpus.  At sandbox scale the exact answer is cheap,
so each operator reports sketch NEXT TO exact — the overestimate /
false-positive behavior is the deliverable, and it is deterministic:
every hash is `portable_hash60` (md5-derived), so the DuckDB oracle
reproduces the identical counters, bits, and errors.

[CMS05] Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications", J. Algorithms 55(1), 2005.
[Bloom70] Bloom, "Space/time trade-offs in hash coding with allowable
errors", CACM 13(7), 1970.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.textops.dedup import portable_hash60
from linkgraph.textops.textstats import TOKEN_RE


def _cm_bucket(col, row: int, width: int):
    return F.pmod(portable_hash60(col, seed=row), F.lit(width))


def count_min_tokens(
    docs: DataFrame,
    width: int = 128,
    depth: int = 4,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Count-min frequency estimates vs exact counts for the exact top-k
    tokens: (token, exact_n, cm_est), cm_est >= exact_n always [CMS05].

    Plan: ONE token explode feeds both sides.  The exact side is a hash
    aggregate on the token (map-side combined) + TakeOrdered(k).  The
    sketch side appends `depth` (row, bucket) pairs per occurrence via a
    posexplode over the seeded-hash array — the counter table is at most
    depth*width rows regardless of corpus size, so the top-k probe joins
    it broadcast.  At 100 TB the exact side disappears and the counter
    table IS the artifact: constant memory, additive across partitions
    and across time windows.
    """
    if width < 1 or depth < 1 or k < 1:
        raise ValueError("count_min_tokens: width, depth, k must be >= 1")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("tok")
    )
    toks = toks.localCheckpoint(eager=False)

    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    topk = exact.orderBy(F.desc("exact_n"), F.asc("tok")).limit(k)

    counters = (
        toks.select(
            F.posexplode(
                F.array(*[_cm_bucket("tok", r, width) for r in range(depth)])
            ).alias("r", "b")
        )
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probe = topk.select(
        "tok",
        "exact_n",
        F.posexplode(
            F.array(*[_cm_bucket("tok", r, width) for r in range(depth)])
        ).alias("r", "b"),
    )
    return (
        probe.join(F.broadcast(counters), ["r", "b"])
        .groupBy("tok", "exact_n")
        .agg(F.min("c").alias("cm_est"))
        .select(
            F.col("tok").alias("token"),
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("cm_est").cast("long").alias("cm_est"),
        )
    )


def bloom_dedup_audit(
    docs: DataFrame,
    m_bits: int = 1024,
    k_hashes: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bloom-filter pre-dedup audit: build a Bloom filter over the text
    digests of one half of the corpus (even ids), probe the other half,
    and report one row

        (n_build, n_probe, bloom_hits, true_dups, false_pos, fp_rate)

    where bloom_hits counts probe docs whose k bit positions are ALL set,
    true_dups counts probe docs whose digest really occurs on the build
    side, and false_pos = bloom_hits - true_dups (never negative: a Bloom
    filter has no false negatives [Bloom70]).

    This is the scale pattern for incremental dedup: ship an m-bit filter
    of yesterday's corpus to today's scan and anti-join only the hits —
    false positives cost a recheck, never a lost duplicate.  The bit
    table here is relational (≤ m rows of set positions, broadcast to the
    probe); a cluster deployment would pack it into int64 limbs exactly
    like the MS-BFS seen bitset.  fp_rate is rounded to 6 so both engines
    agree on the single float.
    """
    if m_bits < 1 or k_hashes < 1:
        raise ValueError("bloom_dedup_audit: m_bits and k_hashes must be >= 1")
    dg = docs.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("h")
    )
    build = dg.where(F.pmod(F.col("id"), F.lit(2)) == 0)
    probe = dg.where(F.pmod(F.col("id"), F.lit(2)) == 1)

    def positions(df: DataFrame) -> DataFrame:
        return df.select(
            "id",
            "h",
            F.explode(
                F.array(
                    *[
                        F.pmod(portable_hash60("h", seed=i), F.lit(m_bits))
                        for i in range(k_hashes)
                    ]
                )
            ).alias("pos"),
        )

    bits = positions(build).select("pos").distinct()  # ≤ m_bits rows
    build_h = build.select("h").distinct()

    hit_flags = (
        positions(probe)
        .join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("id", "h")
        .agg(F.count(F.lit(1)).alias("nset"))
        .where(F.col("nset") == k_hashes)
    )
    per_probe = probe.join(
        hit_flags.select("id", F.lit(1).alias("hit")), "id", "left"
    ).join(
        build_h.select(F.col("h"), F.lit(1).alias("dup")), "h", "left"
    )
    return (
        per_probe.agg(
            F.count(F.lit(1)).cast("long").alias("n_probe"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("bloom_hits"),
            F.sum(F.coalesce(F.col("dup"), F.lit(0))).cast("long").alias("true_dups"),
        )
        .crossJoin(build.agg(F.count(F.lit(1)).cast("long").alias("n_build")))
        .select(
            "n_build",
            "n_probe",
            "bloom_hits",
            "true_dups",
            (F.col("bloom_hits") - F.col("true_dups")).cast("long").alias("false_pos"),
            F.round(
                (F.col("bloom_hits") - F.col("true_dups"))
                / F.greatest(F.col("n_probe") - F.col("true_dups"), F.lit(1)),
                6,
            ).alias("fp_rate"),
        )
    )


HLL_P = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_W = 60 - HLL_P             # bits left after the register index
# alpha_m for m=64 [FFGM07]: 0.7213 / (1 + 1.079/m)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_distinct(
    df: DataFrame, key_col: str, group_col: str
) -> DataFrame:
    """Portable HyperLogLog distinct-count per group, reported next to
    the exact count: (group, exact_n, hll_est).

    [FFGM07] Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the
    analysis of a near-optimal cardinality estimation algorithm",
    AofA 2007.

    The register stream is the 100 TB shape: COUNT(DISTINCT) shuffles
    every distinct key, while the HLL state is m=64 bytes per group,
    merged map-side by MAX and additive across partitions, days, and
    reruns.  Spark ships approx_count_distinct built in, but its sketch
    is not reproducible outside the JVM — this one is built from
    `portable_hash60`, so the DuckDB oracle computes bit-identical
    registers, and the harmonic-mean denominator is assembled as an
    EXACT integer (Σ 2^(W+1-M_j) ≤ m·2^(W+1) < 2^61 fits a long), so the
    estimate is ONE float division on both engines — no
    summation-order noise to round away.  Small-range correction
    (linear counting, E ≤ 2.5m with empty registers) matches [FFGM07].
    """
    key = F.col(key_col).cast("string")
    h = portable_hash60(key)
    reg = F.pmod(h, F.lit(HLL_M))
    w = F.shiftright(h, HLL_P)  # h is 60-bit nonnegative: logical shift
    # rank of the first set bit in the W-bit window, 1-based; W+1 if w=0.
    # floor(log2) runs in float64 on BOTH engines, so any rounding at the
    # 2^53 boundary is reproduced identically.
    rho = F.when(w == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W) - F.floor(F.log2(w.cast("double"))).cast("long")
    )
    regs = (
        df.select(F.col(group_col).alias("grp"), reg.alias("reg"), rho.alias("rho"))
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("m"))
    )
    scale = HLL_W + 1  # 2^(scale - M_j) is integral for every M_j in [1, W+1]
    per = regs.groupBy("grp").agg(
        # pyspark's F.shiftleft only takes a literal bit count; the SQL
        # form accepts an expression
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - m)")).alias("isum"),
        F.count(F.lit(1)).alias("nreg"),
    )
    v_zero = F.lit(HLL_M) - F.col("nreg")
    isum_full = F.col("isum") + v_zero * F.lit(1 << scale)
    e_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << scale)) / isum_full
    est = F.when(
        (e_raw <= 2.5 * HLL_M) & (v_zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_zero),
    ).otherwise(e_raw)
    exact = (
        df.select(F.col(group_col).alias("grp"), F.col(key_col).alias("k"))
        .groupBy("grp")
        .agg(F.countDistinct("k").alias("exact_n"))
    )
    return exact.join(per, "grp").select(
        F.col("grp").alias(group_col),
        F.col("exact_n").cast("long").alias("exact_n"),
        F.round(est, 4).alias("hll_est"),
    )


def kmv_jaccard_pairs(
    df: DataFrame, set_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """Pairwise Jaccard similarity between the key-sets of every pair of
    `set_col` values, exact next to the KMV (bottom-k) estimate:
    (set_a, set_b, exact_j, kmv_j), set_a < set_b.

    [BHRSG07] Beyer, Haas, Reinwald, Sismanis, Gemulla, "On synopses for
    distinct-value estimation under multiset operations", SIGMOD 2007.

    The bottom-k signature B_k(S) = the k smallest portable-hash values
    of S is a fixed-size, mergeable set synopsis: B_k(A ∪ B) is computed
    from the two signatures alone, and J(A,B) ≈ |B_k(A∪B) ∩ B_k(A) ∩
    B_k(B)| / k.  At 100 TB each set ships k longs instead of its
    members, and the pairwise stage runs over signatures only — the
    exact side here (distinct-pair intersection counts) is the part that
    stops scaling.  Estimates are pure integer counting until the final
    division, so both engines agree exactly.
    """
    if k < 1:
        raise ValueError("kmv_jaccard_pairs: k must be >= 1")
    from pyspark.sql import Window

    m = df.select(
        F.col(set_col).alias("s"),
        portable_hash60(F.col(key_col).cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("s").orderBy(F.asc("h"))
    sk = m.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)

    a, b = sk.alias("a"), sk.alias("b")
    # bottom-k of the UNION from the two signatures alone
    uni = (
        a.join(b, F.col("a.s") < F.col("b.s"))
        .select(
            F.col("a.s").alias("sa"),
            F.col("b.s").alias("sb"),
            F.col("a.h").alias("h"),
        )
        .union(
            a.join(b, F.col("a.s") < F.col("b.s")).select(
                F.col("a.s").alias("sa"),
                F.col("b.s").alias("sb"),
                F.col("b.h").alias("h"),
            )
        )
        .distinct()
    )
    wu = Window.partitionBy("sa", "sb").orderBy(F.asc("h"))
    uk = uni.withColumn("rn", F.row_number().over(wu)).where(F.col("rn") <= k)
    in_a = sk.select(F.col("s").alias("sa"), "h")
    in_b = sk.select(F.col("s").alias("sb"), "h")
    tri = (
        uk.join(in_a, ["sa", "h"], "left_semi")
        .join(in_b, ["sb", "h"], "left_semi")
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("both"))
    )
    ksz = uk.groupBy("sa", "sb").agg(F.count(F.lit(1)).alias("kk"))

    sets = m.groupBy("s").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        m.alias("x")
        .join(m.alias("y"), (F.col("x.h") == F.col("y.h")) & (F.col("x.s") < F.col("y.s")))
        .groupBy(F.col("x.s").alias("sa"), F.col("y.s").alias("sb"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    pairs = (
        sets.alias("p")
        .join(sets.alias("q"), F.col("p.s") < F.col("q.s"))
        .select(
            F.col("p.s").alias("sa"),
            F.col("q.s").alias("sb"),
            F.col("p.n").alias("na"),
            F.col("q.n").alias("nb"),
        )
        .join(inter, ["sa", "sb"], "left")
        .withColumn("i", F.coalesce("i", F.lit(0)))
    )
    return (
        pairs.join(tri, ["sa", "sb"], "left")
        .join(ksz, ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("set_a"),
            F.col("sb").alias("set_b"),
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6).alias(
                "exact_j"
            ),
            F.round(
                F.coalesce(F.col("both"), F.lit(0)) / F.col("kk"), 6
            ).alias("kmv_j"),
        )
    )


def cm_join_size(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Equi-join cardinality estimate by count-min inner product, next to
    the exact size: one row (exact_n, cm_est, rel_err).

    |A ⋈ B| = Σ_k f_A(k)·f_B(k); the CM estimate is min over rows of
    Σ_b cmA[r][b]·cmB[r][b] — an overestimate in expectation [CMS05 §4.2].
    This is the cardinality-estimation primitive a distributed planner
    needs BEFORE committing to a join strategy: each side's sketch is a
    depth×width counter table built in one map-side-combined pass, and
    the inner product is a depth×width elementwise job — no data moves.
    Integer arithmetic end-to-end (counts and products fit longs at any
    realistic skew), so both engines agree exactly until rel_err's one
    division.
    """
    if width < 1 or depth < 1:
        raise ValueError("cm_join_size: width and depth must be >= 1")

    def counters(df: DataFrame, key: str) -> DataFrame:
        return (
            df.select(
                F.posexplode(
                    F.array(
                        *[
                            _cm_bucket(F.col(key).cast("string"), r, width)
                            for r in range(depth)
                        ]
                    )
                ).alias("r", "b")
            )
            .groupBy("r", "b")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    ca = counters(left, left_key)
    cb = counters(right, right_key)
    est = (
        ca.join(cb.withColumnRenamed("c", "c2"), ["r", "b"])
        .groupBy("r")
        .agg(F.sum(F.col("c") * F.col("c2")).alias("ip"))
        .agg(F.min("ip").cast("long").alias("cm_est"))
    )
    exact = (
        left.select(F.col(left_key).alias("k"))
        .join(right.select(F.col(right_key).alias("k")), "k")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    )
    return exact.crossJoin(est).select(
        "exact_n",
        "cm_est",
        F.round(
            (F.col("cm_est") - F.col("exact_n")) / F.greatest("exact_n", F.lit(1)), 6
        ).alias("rel_err"),
    )


def misra_gries_partition_summaries(
    items: DataFrame, k: int, item_col: str = "item"
) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries [MG82]: each partition
    streams its Arrow batches through a k-counter MG table (batch
    value_counts merged into the table; on overflow the (k+1)-th largest
    count is subtracted from every counter and non-positive counters
    drop — the standard mergeable decrement).  Output is ≤k counter rows
    per partition plus one `item IS NULL` sentinel carrying the
    partition's row count, so the caller gets candidates AND the exact
    total n from ONE pass.

    Guarantee (the reason this scales): any item with global frequency
    > n/k appears in at least one partition's summary (pigeonhole: some
    partition has local share > n_p/k ≥ n_p/(k+1), which MG never
    evicts).  Memory is O(k) per partition and the pass emits ≤P·(k+1)
    rows — no shuffle of the item stream at all, where a plain groupBy
    over trillion-cardinality keys shuffles O(distinct) rows and blows
    map-side combine hash tables.
    """
    import pyarrow as pa

    def mg(batches):
        counters: dict = {}
        total = 0
        for b in batches:
            s = b.column(0).to_pandas().dropna()
            total += len(s)
            for item, c in s.value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                cuts = sorted(counters.values(), reverse=True)
                delta = cuts[k]  # (k+1)-th largest
                counters = {
                    i: c - delta for i, c in counters.items() if c - delta > 0
                }
        yield pa.RecordBatch.from_pydict(
            {
                "item": list(counters.keys()) + [None],
                "cnt": [int(c) for c in counters.values()] + [total],
            },
            schema=pa.schema([("item", pa.string()), ("cnt", pa.int64())]),
        )

    return items.select(F.col(item_col).cast("string").alias("item")).mapInArrow(
        mg, "item string, cnt long"
    )


def token_heavy_hitters(
    docs: DataFrame, k: int, text_col: str = "text"
) -> DataFrame:
    """EXACT heavy hitters over the token stream: every token with
    frequency strictly greater than n/k, with its exact count — the
    two-pass sketch-then-verify shape [MG82 + pigeonhole]:

      pass 1  per-partition Misra-Gries summaries (O(k) memory, ≤P·(k+1)
              rows emitted, zero shuffle of the stream) — a provable
              SUPERSET of the answer plus the exact total n;
      pass 2  exact counts of the ≤P·k candidates only: the candidate
              set broadcasts, the semi-join filter prunes the token
              stream AT THE SCAN, and the surviving rows groupBy-count
              with map-side combine over ≤P·k distinct keys.

    The result provably equals `GROUP BY token HAVING COUNT(*)*k > n`
    (the driver oracle runs exactly that), while never materializing a
    trillion-key aggregate: that is the 100 TB posture.  The threshold
    comparison is all-integer (cnt*k > n) — no float boundary.
    """
    tok = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_RE), 0)
        ).alias("item")
    )
    summ = misra_gries_partition_summaries(tok, k).localCheckpoint(eager=True)
    n = int(
        summ.where(F.col("item").isNull()).agg(F.sum("cnt")).first()[0] or 0
    )
    cand = summ.where(F.col("item").isNotNull()).select("item").distinct()
    return (
        tok.join(F.broadcast(cand), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * k > n)
        .select(F.col("item").alias("token"), F.col("cnt"))
    )
