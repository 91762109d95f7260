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
