"""Structured Streaming ingest: incremental drops produce the same edge set
as a one-shot batch derivation; replayed duplicates are dropped; windowed
aggregation handles the stream schema."""

import os

import pytest
from pyspark.sql import functions as F

from linkgraph.fixtures import make_transcripts
from linkgraph.schemas import TRANSCRIPTS
from linkgraph.sources.derive import shared_key_conv_edges
from linkgraph.streaming.ingest import (
    IncrementalEdgeStore,
    hourly_turn_counts,
    read_transcript_stream,
    run_ingest,
)


@pytest.fixture()
def drops(spark, tmp_path):
    """Three parquet drops: convs 0-39, 40-79 (+ replay of conv 10), 80-119."""
    pdf = make_transcripts(120)
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    bounds = [(0, 40), (40, 80), (80, 120)]
    for i, (lo, hi) in enumerate(bounds):
        part = pdf[(pdf.conv_id >= f"c{lo:08d}") & (pdf.conv_id < f"c{hi:08d}")]
        if i == 1:  # replay: duplicate turns of one conv from drop 0
            part = __import__("pandas").concat(
                [part, pdf[pdf.conv_id == "c00000010"]], ignore_index=True
            )
        spark.createDataFrame(part, schema=TRANSCRIPTS).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"drop{i}"))
    # file streaming source reads files under one dir: flatten
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for i in range(3):
        d = os.path.join(src, f"drop{i}")
        for fn in os.listdir(d):
            if fn.endswith(".parquet"):
                os.rename(os.path.join(d, fn), os.path.join(flat, f"d{i}_{n}.parquet"))
                n += 1
    return flat


def test_incremental_equals_batch(spark, tmp_path, drops):
    store = IncrementalEdgeStore(str(tmp_path / "edges"), edge_key="tool")
    # maxFilesPerTrigger=1 forces one microbatch per drop file, so
    # cross-batch shared-key pairs genuinely exercise the cumulative index
    run_ingest(
        spark, drops, store, str(tmp_path / "chk"),
        available_now=True, max_files_per_trigger=1,
    )

    got = {
        (r["src_conv"], r["dst_conv"])
        for r in store.shared_tool_edges(spark).collect()
    }
    batch = spark.createDataFrame(make_transcripts(120), schema=TRANSCRIPTS)
    all_turns = spark.read.parquet(drops).dropDuplicates(["conv_id", "turn_idx"])
    exp = {
        (r["src_conv"], r["dst_conv"])
        for r in shared_key_conv_edges(all_turns, key="tool").collect()
    }
    # cumulative-index derivation closes the cross-batch gap exactly
    assert got == exp
    full = {
        (r["src_conv"], r["dst_conv"])
        for r in shared_key_conv_edges(batch, key="tool").collect()
    }
    assert exp == full  # replayed duplicates don't alter the final edge set

    # turn-adjacency: conv-local, so incremental == batch exactly
    adj = store.turn_adjacency(spark)
    n_turns = make_transcripts(120).groupby("conv_id").size()
    assert adj.count() == int((n_turns - 1).sum())


def test_windowed_counts_schema(spark, drops):
    stream = read_transcript_stream(spark, drops)
    agg = hourly_turn_counts(stream)
    assert set(agg.columns) == {"hour", "conv_id", "n_turns"}
    assert agg.isStreaming


def test_incremental_store_file_uri_root(spark, tmp_path, drops):
    """The store's I/O goes through the Hadoop FS API resolved from the
    root's scheme — an explicit file:// URI root must behave identically
    to a bare path (the same code path serves hdfs:// and s3a://)."""
    store = IncrementalEdgeStore(f"file://{tmp_path}/edges_uri", edge_key="tool")
    run_ingest(spark, drops, store, str(tmp_path / "chk_uri"))
    got = {
        (r["src_conv"], r["dst_conv"])
        for r in store.shared_tool_edges(spark).collect()
    }
    all_turns = spark.read.parquet(drops)
    exp = {
        (r["src_conv"], r["dst_conv"])
        for r in shared_key_conv_edges(all_turns, key="tool").collect()
    }
    assert got == exp
