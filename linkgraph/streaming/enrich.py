"""Watermarked stream-stream interval join — the attribution primitive
(§2.10): match each `purchase` to every same-user `click` at most
`horizon_s` seconds before it, both sides arriving as unbounded streams.

This is the one streaming shape the other §2.10 operators don't cover:
ingest/dedup/sessions/trending are all single-stream (stateful map or
stream-static join); here BOTH sides are streams, so the engine must
buffer each side keyed by user until the other side's watermark proves no
more matches can arrive.  Spark's native stream-stream join does exactly
that when given (a) watermarks on both inputs and (b) an explicit event-
time constraint in the join condition — the constraint is what bounds the
buffered state to `horizon_s` of history per side instead of the whole
stream, which is the difference between O(rate x horizon) and O(total
data) state at 10^12-event scale.

Semantics: INNER join, so results are emitted eagerly as matches appear
(watermarks only gate state EVICTION, not emission) — with every input
processed, the output equals the batch join row for row, which is what
tests/test_streaming_enrich.py asserts across forced microbatch
boundaries including cross-batch matches in both directions (click lands
first / purchase lands first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

OUT_COLS = ("user_id", "click_id", "buy_id", "gap_s", "value")


def _sides(events: DataFrame, horizon_s: int, watermark: str | None):
    """Project the two event-type slices; watermark=None -> batch mirror."""
    clicks = events.where(F.col("event_type") == "click")
    buys = events.where(F.col("event_type") == "purchase")
    if watermark is not None:
        clicks = clicks.withWatermark("ts", watermark)
        buys = buys.withWatermark("ts", watermark)
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    b = buys.select(
        F.col("user_id").alias("buy_user"),
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("buy_ts"),
        F.col("value"),
    )
    cond = (
        (c.user_id == b.buy_user)
        & (b.buy_ts >= c.click_ts)
        & (b.buy_ts <= c.click_ts + F.expr(f"INTERVAL {int(horizon_s)} SECONDS"))
    )
    return c, b, cond


def attribution_pairs(
    events: DataFrame, horizon_s: int = 3600, watermark: str | None = "1 hour"
) -> DataFrame:
    """(user_id, click_id, buy_id, gap_s, value): every purchase matched
    to every same-user click within `horizon_s` seconds before it.

    Works on a STREAMING events frame (stream-stream join with per-side
    watermarks and the range constraint bounding join state) and, with
    `watermark=None`, on a static frame — same code path, so the batch
    mirror is definitionally the same query.
    """
    c, b, cond = _sides(events, horizon_s, watermark)
    return c.join(b, cond, "inner").select(
        "user_id",
        "click_id",
        "buy_id",
        (
            F.col("buy_ts").cast("double") - F.col("click_ts").cast("double")
        ).cast("long").alias("gap_s"),
        "value",
    )
