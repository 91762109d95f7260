"""Streaming sliding-window trending: incremental (forced multi-batch,
append-closed panes) equals the batch mirror for every closed window;
top-k ranking matches a python oracle."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.streaming.trending import (
    run_trending_ingest,
    sliding_event_counts,
    trending_topk,
)

T0 = pd.Timestamp("2026-01-01 00:00:00")


def _event_rows():
    """(event_id, minutes-offset, event_type, drop) — spread over ~25 min
    so several 10-min/5-min sliding panes close; cross-batch keys."""
    rows = []
    eid = 0

    def add(minute, et, drop):
        nonlocal eid
        rows.append((eid, minute, et, drop))
        eid += 1

    for m, et in [(0, "view"), (1, "view"), (2, "click"), (4, "view"),
                  (6, "click"), (7, "view"), (9, "buy")]:
        add(m, et, 0)
    for m, et in [(8, "view"), (11, "click"), (12, "view"), (14, "buy"),
                  (16, "view"), (18, "click")]:
        add(m, et, 1)  # m=8 is watermark-safe late data for pane [5,15)
    for m, et in [(21, "view"), (22, "buy"), (24, "view")]:
        add(m, et, 2)
    # sentinel far in the future: pushes the watermark past every real pane
    add(24 * 60, "zzz_sentinel", 2)
    return rows


@pytest.fixture()
def drops(spark, tmp_path):
    src = str(tmp_path / "ev_src")
    os.makedirs(src)
    for drop in range(3):
        pdf = pd.DataFrame(
            [
                {
                    "event_id": i,
                    "ts": T0 + pd.Timedelta(minutes=m),
                    "user_id": i % 5,
                    "event_type": et,
                    "value": 1.0,
                    "props": "{}",
                }
                for i, m, et, d in _event_rows()
                if d == drop
            ]
        )
        spark.createDataFrame(
            pdf,
            schema="event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).coalesce(1).write.parquet(os.path.join(src, f"part_{drop}.parquet.d"))
    # flatten: one file per drop so maxFilesPerTrigger=1 => 3 microbatches
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for drop in range(3):
        d = os.path.join(src, f"part_{drop}.parquet.d")
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".parquet"):
                os.rename(os.path.join(d, fn), os.path.join(flat, f"f{drop}_{n}.parquet"))
                n += 1
    return flat


def test_incremental_equals_batch(spark, drops, tmp_path):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    run_trending_ingest(
        spark, drops, sink, ckpt, max_files_per_trigger=1
    )
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(sink)
        .where(F.col("event_type") != "zzz_sentinel")
        .collect()
    }
    batch = sliding_event_counts(spark.read.parquet(drops))
    want = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in batch.where(F.col("event_type") != "zzz_sentinel").collect()
    }
    assert got == want
    assert got  # several panes actually closed


def test_topk_matches_python(spark, drops):
    counts = sliding_event_counts(spark.read.parquet(drops)).where(
        F.col("event_type") != "zzz_sentinel"
    )
    rows = counts.collect()
    byw = {}
    for r in rows:
        byw.setdefault(r["window_start"], []).append((r["event_type"], r["n"]))
    want = {}
    for ws, lst in byw.items():
        ranked = sorted(lst, key=lambda x: (-x[1], x[0]))[:2]
        want[ws] = [(et, n, i + 1) for i, (et, n) in enumerate(ranked)]
    got = {}
    for r in trending_topk(counts, k=2).collect():
        got.setdefault(r["window_start"], []).append(
            (r["event_type"], r["n"], r["rank"])
        )
    for ws in got:
        got[ws].sort(key=lambda x: x[2])
    assert got == want
