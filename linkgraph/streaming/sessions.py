"""Streaming gap-based sessionization — the custom stateful operator of
SURVEY.md §2.10, built on `applyInPandasWithState` (Arrow-batched state
kernel, the Spark-native replacement for a hand-rolled per-key session
tracker).

Semantics match `linkgraph.operators.events.sessionize` on closed
sessions PROVIDED disorder is bounded by the open session's span: a
session closes when event time advances past last_event + gap, which for
the per-key OPEN session means WATERMARK past that point — enforced with
an event-time timeout.  In-batch gap SPLITS, however, emit their closed
prefix immediately (only the newest session stays in state), so a
within-watermark late event that lands inside an already-emitted span
diverges from batch as a singleton — see the disorder paragraph below;
equality with batch requires late events to fall inside or gap-adjacent
to the still-open session.  Each emitted row is
(user_id, session_start, n_events, duration_s, total_value), identical to
the batch operator, so incremental ≡ batch equality is testable row for
row (tests/test_streaming_sessions.py).

State per user is ONE OPEN SESSION SUMMARY (start_us, last_us, n, total) —
bytes per user, not events per user, so state size is |active users|, the
same bound the batch operator's single exchange gives.  In-batch events
are sorted (ts, event_id) and gap-split vectorized in pandas; a
within-watermark CROSS-batch event that lands before the open session's
tail merges into it when it falls inside or gap-adjacent-before the open
span (matching batch: adding an event never splits a session) and
otherwise closes immediately as a best-effort singleton — a summary
state cannot re-sort history, so bound disorder with the watermark, as
any stateful session operator must.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "user_id long, session_start string, n_events long, "
    "duration_s long, total_value double"
)
STATE_SCHEMA = "start_us long, last_us long, n long, total double"


def _emit(user: int, start_us: int, last_us: int, n: int, total: float) -> dict[str, Any]:
    start = pd.Timestamp(start_us, unit="us")
    return {
        "user_id": user,
        "session_start": start.strftime("%Y-%m-%d %H:%M:%S"),
        "n_events": n,
        # per-event floored epoch seconds, matching the batch operator
        "duration_s": last_us // 1_000_000 - start_us // 1_000_000,
        "total_value": round(total, 6),
    }


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs: Iterable[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        closed: list[dict[str, Any]] = []
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            closed.append(_emit(user, start_us, last_us, n, total))
            state.remove()
            yield pd.DataFrame(closed)
            return

        parts = [p for p in pdfs if len(p)]
        if not parts:
            yield pd.DataFrame([])
            return
        ev = pd.concat(parts).sort_values(["ts", "event_id"])
        ts_us = ev["ts"].values.astype("datetime64[us]").astype("int64")
        vals = ev["value"].to_numpy()

        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us, last_us, n, total = None, None, 0, 0.0

        for t_us, v in zip(ts_us.tolist(), vals.tolist()):
            if start_us is None:
                start_us, last_us, n, total = t_us, t_us, 1, float(v)
                continue
            if t_us < last_us:
                # in-watermark but out-of-order vs the open session's
                # tail (cross-batch disorder): a summary state cannot
                # re-sort history, so merge when the event falls inside
                # or gap-adjacent-before the open span (batch would keep
                # one session there too — adding an event never splits
                # one), else emit it as its own best-effort singleton
                if t_us // 1_000_000 >= start_us // 1_000_000 - gap_seconds:
                    start_us = min(start_us, t_us)
                    n, total = n + 1, total + float(v)
                else:
                    closed.append(_emit(user, t_us, t_us, 1, float(v)))
                continue
            if t_us // 1_000_000 - last_us // 1_000_000 > gap_seconds:
                closed.append(_emit(user, start_us, last_us, n, total))
                start_us, last_us, n, total = t_us, t_us, 1, float(v)
            else:
                last_us, n, total = t_us, n + 1, total + float(v)

        state.update((int(start_us), int(last_us), int(n), float(total)))
        # close when the event-time watermark passes last + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000 + 1)
        yield pd.DataFrame(closed)

    return fn


def streaming_sessions(
    events: DataFrame,
    gap_seconds: int = 28800,
    watermark: str = "1 hour",
) -> DataFrame:
    """events: streaming DataFrame with (event_id, user_id, ts, value, ...).
    Returns an append-mode stream of CLOSED sessions."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
