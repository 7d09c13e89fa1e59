"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` — the escape hatch for stateful semantics
the built-in streaming operators can't express (gap-based session
windows with per-session payload).

Semantics (the streaming twin of operators/events.sessionize_events):
events for a user belong to one session until a gap > ``gap`` appears;
a session is EMITTED when it closes — either in-batch (a later event
arrives past the gap) or via event-time timeout once the watermark
passes the session's last event + gap. Sessions still open when a
bounded run ends stay in state and are not emitted (documented
contract; a production stream eventually times them out).

Scale notes: state is ONE tuple (start, last, count, value-sum) per
active user — O(active users), not O(events); the groupBy shuffles
events to their user's partition once, and Arrow moves each group as
pandas batches, never Python rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_US = 30 * 60 * 1_000_000

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _session_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    closed: list[tuple[int, int, int, int, float]] = []

    if state.hasTimedOut:
        start, last, n, sv = state.get
        closed.append((user_id, start, last, n, sv))
        state.remove()
    else:
        batch = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = (batch["ts"].astype("int64") // 1000).tolist()
        values = batch["value"].tolist()
        if state.exists:
            start, last, n, sv = state.get
        else:
            start, last, n, sv = None, None, 0, 0.0
        for t, v in zip(ts_us, values):
            if last is not None and t - last > SESSION_GAP_US:
                closed.append((user_id, start, last, n, sv))
                start, n, sv = None, 0, 0.0
            if start is None:
                start = t
            n += 1
            sv += float(v)
            last = t
        state.update((start, last, n, sv))
        # event-time timeout: fires once the watermark passes last + gap
        state.setTimeoutTimestamp((last + SESSION_GAP_US) // 1000)

    yield pd.DataFrame(
        closed, columns=["user_id", "session_start_us", "session_end_us", "n_events", "sum_value"]
    )


def sessionize_stream(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Gap-based session windows over a watermarked event stream.
    ``events`` needs columns (user_id, ts timestamp, value double)."""
    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
