"""Streaming incremental connected components: after any drained prefix
of edge microbatches, the label store equals batch connected_components
over all edges seen so far — including a batch that MERGES two
previously separate components — and ingest resumes from its checkpoint
(second run processes only new files)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.algos.components import connected_components
from linkgraph.fixtures import edges_df
from linkgraph.graph import LinkGraph
from linkgraph.streaming.components import IncrementalComponentStore, run_cc_ingest

BATCHES = [
    # batch 0: two components {1,2,3} and {10,11}
    [(1, 2), (2, 3), (10, 11)],
    # batch 1: new component {20,21,22}; growth of {1,2,3} by vertex 4
    [(20, 21), (21, 22), (3, 4)],
    # batch 2: MERGE {1..4} with {20..22} via (2, 20); fresh pair {30,31};
    # an intra-component no-op edge (1, 3)
    [(2, 20), (30, 31), (1, 3)],
]


def _write_batch(spark, src, idx):
    pdf = pd.DataFrame(
        [
            {
                "src": a,
                "dst": b,
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=idx),
            }
            for a, b in BATCHES[idx]
        ]
    )
    tmp = os.path.join(src, f"_stage{idx}")
    spark.createDataFrame(pdf, schema="src long, dst long, ts timestamp").coalesce(
        1
    ).write.mode("overwrite").parquet(tmp)
    n = 0
    for fn in sorted(os.listdir(tmp)):
        if fn.endswith(".parquet"):
            os.rename(os.path.join(tmp, fn), os.path.join(src, f"b{idx}_{n}.parquet"))
            n += 1


def _batch_cc(spark, upto):
    pairs = [p for b in BATCHES[: upto + 1] for p in b]
    g = LinkGraph.from_undirected(edges_df(spark, pairs), num_partitions=4)
    return {
        (r.vid, r.comp) for r in connected_components(g).collect()
    }


def test_streaming_cc_prefix_and_merge(spark, tmp_path):
    src = str(tmp_path / "edge_src")
    os.makedirs(src)
    store = IncrementalComponentStore(str(tmp_path / "ccstore"))
    chk = str(tmp_path / "chk")

    # ---- prefix: drain batch 0 only, labels == batch CC over batch 0
    _write_batch(spark, src, 0)
    run_cc_ingest(spark, src, store, chk, available_now=True, max_files_per_trigger=1)
    assert {
        (r.vid, r.comp) for r in store.labels(spark).collect()
    } == _batch_cc(spark, 0)

    # ---- resume: add batches 1+2, same checkpoint → only new files run
    _write_batch(spark, src, 1)
    _write_batch(spark, src, 2)
    run_cc_ingest(spark, src, store, chk, available_now=True, max_files_per_trigger=1)
    got = {(r.vid, r.comp) for r in store.labels(spark).collect()}
    want = _batch_cc(spark, 2)
    assert got == want
    # the merge really happened: 1..4 and 20..22 share one component id
    comp_of = dict(got)
    merged = {comp_of[v] for v in (1, 2, 3, 4, 20, 21, 22)}
    assert len(merged) == 1
    assert comp_of[30] == comp_of[31] != next(iter(merged))
