"""Custom stateful streaming operator: event-time sessionization via
applyInPandasWithState.

No reference analog (the reference has no streaming); this is the
canonical "custom stateful operator" of a training-data/event pipeline
(brief: "applyInPandasWithState for custom stateful operators"), and
the streaming counterpart of the batch q_sessionize contract query.

Semantics: per-user sessions close when the gap between consecutive
events exceeds `gap`; a user's open session is held in state and
closed by EVENT-TIME TIMEOUT once the watermark passes last_event +
gap (late events beyond the watermark are dropped by the upstream
watermark). Output (append): one row per CLOSED session.

State per key is three scalars (start, last, n) — O(active users)
state, the bounded-state property that lets this run on an unbounded
stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
STATE_SCHEMA = "start long, last long, n long"  # epoch micros
US = 1_000_000


def _close_row(user_id: int, start: int, last: int, n: int) -> dict:
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(start, unit="us"),
        "session_end": pd.Timestamp(last, unit="us"),
        "n_events": n,
    }


def make_sessionizer(gap_seconds: int = 1800):
    gap_us = gap_seconds * US

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([_close_row(user_id, start, last, n)])
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(
                int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
            )
        ts.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        out: list[dict] = []
        for t in ts:
            if last is not None and t - last > gap_us:
                out.append(_close_row(user_id, start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        if last is not None:
            state.update((start, last, n))
            # close by timeout once the watermark passes last + gap
            state.setTimeoutTimestamp((last + gap_us) // 1000)
        yield pd.DataFrame(out)

    return fn


def sessionize_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
    late_threshold: str = "30 minutes",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, late_threshold)
        .groupBy(user_col)
        .applyInPandasWithState(
            make_sessionizer(gap_seconds),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
