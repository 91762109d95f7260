"""Streaming sessionization (applyInPandasWithState) emits exactly the
batch operator's sessions once the watermark closes them."""

import datetime as dt
import os

import pandas as pd

from linkgraph.operators.events import sessionize
from linkgraph.streaming.sessions import streaming_sessions

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
GAP_S = 1800  # 30 min
SENTINEL = dt.datetime(2024, 6, 1)  # far future: forces every real session closed

SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def _events():
    rows = []
    eid = 0

    def ev(uid, minutes, value):
        nonlocal eid
        eid += 1
        rows.append((eid, uid, T0 + dt.timedelta(minutes=minutes), value))

    # user 1: sessions [0,10,20], [80,85], [200]
    for m, v in [(0, 1.0), (10, 2.0), (20, 0.5), (80, 3.0), (85, 1.5), (200, 9.0)]:
        ev(1, m, v)
    # user 2: one long session straddling the batch split
    for m, v in [(0, 1.0), (25, 1.0), (50, 1.0), (75, 1.0)]:
        ev(2, m, v)
    # user 3: single event
    ev(3, 5, 4.0)
    return rows


def test_streaming_sessions_equal_batch(spark, tmp_path):
    rows = _events()
    # 3 drops split mid-stream (user 2's session spans drops 0 and 1), then
    # two sentinel drops: the first advances the watermark past every real
    # session's close point, the second gives the engine a batch in which
    # the already-advanced watermark fires the event-time timeouts
    drops = [
        [r for r in rows if r[2] < T0 + dt.timedelta(minutes=40)],
        [r for r in rows if T0 + dt.timedelta(minutes=40) <= r[2] < T0 + dt.timedelta(minutes=150)],
        [r for r in rows if r[2] >= T0 + dt.timedelta(minutes=150)],
        [(9001, 999, SENTINEL, 0.0)],
        [(9002, 999, SENTINEL + dt.timedelta(hours=3), 0.0)],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, part in enumerate(drops):
        spark.createDataFrame(part, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, f"_tmp{i}")
        )
        # flatten with ordered names so maxFilesPerTrigger=1 batches in order
        d = os.path.join(src, f"_tmp{i}")
        for fn in os.listdir(d):
            if fn.endswith(".parquet"):
                os.rename(os.path.join(d, fn), os.path.join(src, f"drop{i}.parquet"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_sessions(stream, gap_seconds=GAP_S, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["user_id"], r["session_start"]): (
            r["n_events"], r["duration_s"], round(r["total_value"], 6))
        for r in spark.sql("SELECT * FROM sess_out").collect()
        if r["user_id"] != 999
    }

    batch_df = spark.createDataFrame(
        [r for r in rows], SCHEMA
    )
    exp = {
        (r["user_id"], r["session_start"]): (
            r["n_events"], r["duration_s"], round(r["total_value"], 6))
        for r in sessionize(batch_df, gap_seconds=GAP_S).collect()
    }
    assert got == exp
    # sanity: the cross-batch session (user 2) closed as ONE 75-min session
    assert got[(2, "2024-01-01 00:00:00")] == (4, 4500, 4.0)


def test_streaming_sessions_out_of_order_within_watermark(spark, tmp_path):
    """A cross-batch event that lands INSIDE the open session's span (but
    within the watermark) merges into it, matching the batch operator."""
    rows = [
        (1, 7, T0, 1.0),
        (2, 7, T0 + dt.timedelta(minutes=30), 1.0),
        # delivered in a LATER batch but timestamped between the two above
        (3, 7, T0 + dt.timedelta(minutes=15), 2.5),
    ]
    drops = [
        rows[:2],
        [rows[2]],
        [(9001, 999, SENTINEL, 0.0)],
        [(9002, 999, SENTINEL + dt.timedelta(hours=3), 0.0)],
    ]
    src = str(tmp_path / "src2")
    os.makedirs(src)
    for i, part in enumerate(drops):
        d = os.path.join(src, f"_tmp{i}")
        spark.createDataFrame(part, SCHEMA).coalesce(1).write.parquet(d)
        for fn in os.listdir(d):
            if fn.endswith(".parquet"):
                os.rename(os.path.join(d, fn), os.path.join(src, f"drop{i}.parquet"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_sessions(stream, gap_seconds=GAP_S, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("sess_ooo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["user_id"], r["session_start"]): (
            r["n_events"], r["duration_s"], round(r["total_value"], 6))
        for r in spark.sql("SELECT * FROM sess_ooo").collect()
        if r["user_id"] != 999
    }
    exp = {
        (r["user_id"], r["session_start"]): (
            r["n_events"], r["duration_s"], round(r["total_value"], 6))
        for r in sessionize(
            spark.createDataFrame(rows, SCHEMA), gap_seconds=GAP_S
        ).collect()
    }
    assert got == exp == {(7, "2024-01-01 00:00:00"): (3, 1800, 4.5)}
