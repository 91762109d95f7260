"""Z-order layout: per-file extents bound BOTH dimensions (vs a linear
sort, whose second dimension spans the full range in every file)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from linkgraph.operators.layout import zorder_layout_report


def _grid(spark, n=64):
    rows = [(x, y) for x in range(n) for y in range(n)]
    return spark.createDataFrame(rows, "x long, y long")


def test_zorder_bounds_both_dimensions(spark):
    df = _grid(spark)
    files = 16
    rep = zorder_layout_report(df, "x", "y", files=files).collect()
    assert len(rep) == files
    assert sum(r["n_rows"] for r in rep) == 64 * 64
    # every file's extent in EACH dimension is at most half the axis:
    # a 16-file Morton split of a 64x64 grid gives 16x16 quadrant tiles
    for r in rep:
        assert r["max_x"] - r["min_x"] <= 32
        assert r["max_y"] - r["min_y"] <= 32


def test_linear_sort_fails_second_dimension(spark):
    # the contrast claim: sort by x alone -> y spans ~the full axis per file
    df = _grid(spark)
    w = Window.orderBy("x", "y")
    lin = (
        df.withColumn("f", F.ntile(16).over(w))
        .groupBy("f")
        .agg((F.max("y") - F.min("y")).alias("yspan"))
        .collect()
    )
    assert all(r["yspan"] == 63 for r in lin)


def test_edge_partition_audit_vertex_cut_caps_replication(spark):
    from linkgraph.operators.layout import edge_partition_audit

    # star: hub 0 with 40 leaves, symmetric closure — the worst case
    # for 1D src-hash (the hub lands wherever any neighbor hashes)
    pairs = [(0, i) for i in range(1, 41)] + [(i, 0) for i in range(1, 41)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    got = {r.strategy: r for r in edge_partition_audit(e, n_parts=16).collect()}
    # 2D grid replication is capped at 2*sqrt(p) - 1 = 7 per vertex
    assert got["2d_grid"].repl_factor <= 7.0 + 1e-9
    # the hub blows up 1D replication: vertex-cut must win on this graph
    assert got["1d_src_hash"].repl_factor > got["2d_grid"].repl_factor
    assert got["1d_src_hash"].n_parts == 16


def test_edge_partition_audit_rejects_non_square(spark):
    import pytest as _pt

    from linkgraph.operators.layout import edge_partition_audit

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pt.raises(ValueError):
        edge_partition_audit(e, n_parts=12)
