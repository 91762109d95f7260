"""Physical-plan audits: the optimizations the engine claims must be
visible in .explain output — broadcast dispatch in expand, column pruning
keeping `text` out of graph paths, parquet filter pushdown, and
whole-stage codegen on the relational kernel path."""

import pytest
from pyspark.sql import functions as F

from linkgraph.fixtures import edges_df
from linkgraph.graph import LinkGraph


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def small_graph(spark):
    return LinkGraph.from_undirected(
        edges_df(spark, [(i, (i + 1) % 50) for i in range(50)]), persist=False
    )


def test_expand_broadcasts_small_messages(small_graph):
    msgs = small_graph.vertices().select(F.col("vid").alias("src"), F.lit(1.0).alias("w"))
    plan = _plan(small_graph.expand(msgs, est_rows=50))
    assert "BroadcastHashJoin" in plan


def test_expand_shuffles_when_broadcast_disabled(spark, small_graph):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        msgs = small_graph.vertices().select(
            F.col("vid").alias("src"), F.lit(1.0).alias("w")
        )
        plan = _plan(small_graph.expand(msgs, est_rows=10**9))
        assert "BroadcastHashJoin" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_text_column_pruned_from_graph_path(spark, tmp_path):
    """The heavy `text` column must never reach the scan of a derivation
    that only needs keys (Catalyst column pruning — preserves per-turn
    text bytes by never touching them)."""
    from linkgraph.fixtures import make_transcripts
    from linkgraph.schemas import TRANSCRIPTS
    from linkgraph.sources.derive import shared_key_conv_edges

    path = str(tmp_path / "tr")
    spark.createDataFrame(make_transcripts(30), schema=TRANSCRIPTS).write.parquet(path)
    tr = spark.read.parquet(path)
    plan = _plan(shared_key_conv_edges(tr, key="tool"))
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "text" not in scan
    assert "conv_id" in scan


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    from linkgraph.fixtures import make_transcripts
    from linkgraph.schemas import TRANSCRIPTS

    path = str(tmp_path / "tr2")
    spark.createDataFrame(make_transcripts(30), schema=TRANSCRIPTS).write.parquet(path)
    df = spark.read.parquet(path).where(F.col("conv_id") == "c00000001")
    plan = _plan(df)
    assert "PushedFilters" in plan
    idx = plan.index("PushedFilters")
    assert "conv_id" in plan[idx : idx + 200]


def test_relational_kernel_is_codegen(small_graph):
    """The bit_or ANP aggregation path must stay inside WholeStageCodegen
    (no Python, no interpreted expressions in the hot loop)."""
    msgs = small_graph.vertices().select(
        F.col("vid").alias("src"), *[F.lit(1).cast("long").alias(f"v{i}") for i in range(8)]
    )
    agg = (
        small_graph.expand(msgs, est_rows=50)
        .groupBy("dst")
        .agg(*[F.bit_or(f"v{i}").alias(f"a{i}") for i in range(8)])
    )
    agg.collect()  # AQE: codegen markers appear only in the FINAL plan
    # formatted-mode explain marks codegen stages with a '*' prefix
    # ("* HashAggregate (n)"); the literal WholeStageCodegen node name only
    # appears in simple mode
    plan = _plan(agg)
    assert "* HashAggregate" in plan
    assert "isFinalPlan=true" in plan
