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
