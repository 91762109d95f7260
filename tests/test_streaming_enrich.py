"""Stream-stream interval join (attribution) emits exactly the batch
join's rows, across forced microbatch boundaries in both arrival orders."""

import datetime as dt
import os

from linkgraph.streaming.enrich import attribution_pairs

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
HORIZON_S = 3600

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _events():
    rows = []
    eid = 0

    def ev(uid, minutes, etype, value=0.0):
        nonlocal eid
        eid += 1
        rows.append((eid, T0 + dt.timedelta(minutes=minutes), uid, etype, value))

    # user 1: click at 0 -> purchases at 30 (in) and 90 (out of horizon)
    ev(1, 0, "click")
    ev(1, 30, "purchase", 10.0)
    ev(1, 90, "purchase", 20.0)
    # user 2: TWO clicks before one purchase (both match)
    ev(2, 10, "click")
    ev(2, 40, "click")
    ev(2, 60, "purchase", 5.0)
    # user 3: purchase BEFORE any click (no match), then click (no purchase)
    ev(3, 5, "purchase", 7.0)
    ev(3, 20, "click")
    # user 4: purchase arrives in an EARLIER batch than its click (disorder)
    ev(4, 200, "purchase", 3.0)
    ev(4, 170, "click")
    # noise the projection must drop
    ev(1, 15, "view")
    ev(2, 15, "error")
    return rows


def _write_drops(spark, src, drops):
    os.makedirs(src)
    for i, part in enumerate(drops):
        d = os.path.join(src, f"_tmp{i}")
        spark.createDataFrame(part, SCHEMA).coalesce(1).write.parquet(d)
        for fn in os.listdir(d):
            if fn.endswith(".parquet"):
                os.rename(os.path.join(d, fn), os.path.join(src, f"drop{i}.parquet"))


def _key(rows):
    return {
        (r.user_id, r.click_id, r.buy_id): (r.gap_s, round(r.value, 6))
        for r in rows
    }


def test_stream_stream_attribution_equals_batch(spark, tmp_path):
    rows = _events()
    # split so user 1's click and first purchase are in different batches,
    # and user 4's purchase lands a batch BEFORE its click
    drops = [
        [r for r in rows if r[1] < T0 + dt.timedelta(minutes=25)],
        [r for r in rows if T0 + dt.timedelta(minutes=25) <= r[1] < T0 + dt.timedelta(minutes=100)],
        [r for r in rows if r[1] >= T0 + dt.timedelta(minutes=190)],  # buy @200
        [r for r in rows if T0 + dt.timedelta(minutes=100) <= r[1] < T0 + dt.timedelta(minutes=190)],  # click @170
    ]
    assert sum(len(d) for d in drops) == len(rows)
    src = str(tmp_path / "src")
    _write_drops(spark, src, drops)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        attribution_pairs(stream, horizon_s=HORIZON_S, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = _key(spark.sql("SELECT * FROM attr_out").collect())

    batch = attribution_pairs(
        spark.createDataFrame(rows, SCHEMA), horizon_s=HORIZON_S, watermark=None
    )
    exp = _key(batch.collect())
    assert got == exp
    # shape sanity: the horizon excluded user 1's late purchase, user 2
    # double-matched, user 3 matched nothing, user 4 matched cross-batch
    users = sorted({u for (u, _, _) in exp})
    assert users == [1, 2, 4]
    assert len([1 for (u, _, _) in exp if u == 2]) == 2
