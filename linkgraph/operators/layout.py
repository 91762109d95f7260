"""Z-order (Morton) data layout — multi-dimensional scan pruning.

A table range-partitioned on ONE column prunes scans on that column and
nothing else; interleaving the bits of two quantized columns into a
Morton key and range-partitioning on THAT bounds every file's extent in
BOTH dimensions (each file covers ~2^-k of each axis for a 4^-k slice of
the key space), so min-max file statistics prune point/range predicates
on either column.  This is the layout trick behind Delta/Iceberg
`ZORDER BY` — here as a plain column expression plus a layout report.

The interleave is pure shift/mask integer sums and the quantization is
a floor over an integer-exact product (see `quantize`), so the key —
and therefore the file assignment given a deterministic tie-break — is
engine-portable and oracle-checkable bit for bit.

At scale: the key is a pure projection (no shuffle); laying data out is
`repartitionByRange(z).sortWithinPartitions(z)` + write, one range
shuffle — the same cost as any sorted write.  `zorder_layout_report`
models the written files with ntile semantics over the key
(deterministic tie-break on the raw columns) computed via the two-phase
range-partition + per-partition rank + broadcast-offset pattern
(graph.py::_dense_ids) — never an unpartitioned window — and emits
per-file min/max extents: the exact statistics a reader's pruning would
use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Z_BITS = 16


def quantize(col, mn: int, mx: int, bits: int = Z_BITS):
    """Quantize col∈[mn,mx] onto [0, 2^bits-1]: floor((x-mn)·(2^b-1)/span).
    The product is integer-exact in a double for spans < 2^36 and the
    floor sits ≥1/span away from the division's rounding error, so the
    value — mirrored by the identical DuckDB expression — is
    engine-stable."""
    span = max(1, int(mx) - int(mn))
    num = (F.col(col).cast("long") - F.lit(int(mn))) * F.lit((1 << bits) - 1)
    return F.floor(num / F.lit(span)).cast("long")


def zorder_key(xq, yq, bits: int = Z_BITS):
    """Interleave two pre-quantized long expressions into a Morton key
    (x in odd bit positions, y in even)."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(xq, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(F.shiftleft(F.shiftright(yq, i).bitwiseAND(F.lit(1)), 2 * i))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_layout_report(
    df: DataFrame, xcol: str, ycol: str, files: int = 64, bits: int = Z_BITS
) -> DataFrame:
    """(file_id, n_rows, min_x, max_x, min_y, max_y): the min-max file
    statistics a z-ordered write of `df` into `files` equal files would
    produce.  Bounds on BOTH columns shrink ~∝ 1/sqrt(files) — the
    pruning win a single-column sort cannot give."""
    bounds = df.agg(
        F.min(xcol).alias("xmn"),
        F.max(xcol).alias("xmx"),
        F.min(ycol).alias("ymn"),
        F.max(ycol).alias("ymx"),
    ).first()
    xq = quantize(xcol, bounds["xmn"], bounds["xmx"], bits)
    yq = quantize(ycol, bounds["ymn"], bounds["ymx"], bits)
    keyed = df.select(
        F.col(xcol).alias("x"),
        F.col(ycol).alias("y"),
        zorder_key(xq, yq, bits).alias("z"),
    )
    # file assignment = ntile(files) over the global (z, x, y) order, but
    # computed WITHOUT an unpartitioned window (which funnels the whole
    # table through one task): graph.py::_dense_ids' two-phase ranking —
    # range-repartition on the order key, rank within each partition, add
    # per-partition offsets (≤P driver-side counts), then apply ntile's
    # bucket arithmetic to the global rank.  Identical output: ntile(k)
    # over n rows gives the first (n mod k) tiles ceil(n/k) rows and the
    # rest floor(n/k), in order.
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = (
        keyed.repartitionByRange(
            p, F.col("z").asc(), F.col("x").asc(), F.col("y").asc()
        )
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r["pid"]: r["n"]
        for r in parts.groupBy("pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    n = acc
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(k), int(v)) for k, v in offsets.items()], "pid int, off long"
        )
    )
    q, rem = divmod(n, files) if files else (0, 0)
    cutoff = (q + 1) * rem  # rows 1..cutoff fall in the big (q+1)-row tiles
    w = Window.partitionBy("pid").orderBy("z", "x", "y")
    r1 = (F.row_number().over(w) + F.col("off")).alias("r")  # global 1-based rank
    ranked = parts.join(off_df, "pid").select("x", "y", r1)
    fid = F.when(
        F.col("r") <= F.lit(cutoff),
        F.expr(f"(r - 1) DIV {q + 1} + 1"),
    ).otherwise(
        # q == 0 implies cutoff == n, so this branch is unreachable then;
        # max(q, 1) only keeps the expression well-formed
        F.expr(f"{rem} + (r - 1 - {cutoff}) DIV {max(q, 1)} + 1")
    )
    return (
        ranked.withColumn("file_id", fid)
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .select(
            F.col("file_id").cast("long").alias("file_id"),
            "n_rows",
            "min_x",
            "max_x",
            "min_y",
            "max_y",
        )
    )


def edge_partition_audit(
    edges: DataFrame, n_parts: int = 16, round_to: int = 6
) -> DataFrame:
    """Edge-cut vs vertex-cut partitioning audit [PowerGraph OSDI'12;
    GraphX 2D]: for the same edge table, compare 1D src-hash
    partitioning against the √p×√p 2D grid vertex-cut on the two
    numbers that decide shuffle cost at cluster scale —

      repl_factor: avg #partitions holding a copy of each vertex
                   (1D grows with hub degree; the 2D grid caps it at
                   2√p − 1 regardless of skew);
      balance:     max partition edge count / mean (1.0 = perfect).

    One row per strategy: (strategy, n_parts, repl_factor, balance).
    Pure relational — each strategy is one projection to a partition id
    plus two rollups (per-part sizes; per-vertex distinct-part counts);
    portable-md5 hashing mirrors in the oracle.  `n_parts` must be a
    perfect square so both strategies compare at the SAME p.
    """
    from linkgraph.textops.dedup import portable_hash60

    k = int(n_parts**0.5)
    if k * k != n_parts:
        raise ValueError("n_parts must be a perfect square")

    def h(col, mod):
        return F.pmod(
            portable_hash60(F.concat(F.col(col).cast("string"), F.lit("#part"))),
            F.lit(mod),
        )

    def audit(tagged, strategy):
        sizes = tagged.groupBy("part").agg(
            F.count(F.lit(1)).cast("long").alias("ne")
        )
        bal = sizes.agg(
            (
                F.max("ne")
                / (F.sum("ne") / F.lit(float(n_parts)))
            ).alias("balance")
        )
        verts = (
            tagged.select(F.col("src").alias("vid"), "part")
            .union(tagged.select(F.col("dst").alias("vid"), "part"))
            .distinct()
            .groupBy("vid")
            .agg(F.count(F.lit(1)).cast("long").alias("np"))
        )
        rf = verts.agg(F.avg("np").alias("repl_factor"))
        return rf.crossJoin(F.broadcast(bal)).select(
            F.lit(strategy).alias("strategy"),
            F.lit(n_parts).cast("long").alias("n_parts"),
            F.round("repl_factor", round_to).alias("repl_factor"),
            F.round("balance", round_to).alias("balance"),
        )

    one_d = edges.select("src", "dst", h("src", n_parts).alias("part"))
    two_d = edges.select(
        "src", "dst", (h("src", k) * k + h("dst", k)).alias("part")
    )
    return audit(one_d, "1d_src_hash").unionByName(audit(two_d, "2d_grid"))
