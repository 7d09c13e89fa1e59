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

API choice: Spark 4 also offers ``transformWithStateInPandas``
(StatefulProcessor + RocksDB state store — composite state, timers,
TTL). Probed in this environment and NOT usable: its state-server
protocol requires the ``google.protobuf`` Python package, which is
absent here (verified: the streaming Python runner crashes with
``ImportError: cannot import name 'descriptor' from 'google.protobuf'``).
``applyInPandasWithState`` has no such dependency and expresses the
same per-key session semantics, so it stays the implementation; a
deployment with protobuf installed could port ``_session_fn`` to a
StatefulProcessor without touching the operator's contract.
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


# ---------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4's arbitrary-state API (the
# successor to applyInPandasWithState: typed state variables on a
# handle, explicit time modes, RocksDB-backed). Implemented alongside
# the legacy operator so both stateful surfaces are covered.
# ---------------------------------------------------------------------------

try:  # the class interface needs pyspark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningUserAgg(StatefulProcessor):
        """Per-user running aggregate (event count + max value) kept in
        a typed ValueState — the online feature-store accumulator
        pattern: each micro-batch folds its rows into O(1) state per
        user and emits the refreshed feature row (Update mode).

        State is one (n, mx) tuple per user — O(users), not O(events);
        rows reach their user's partition via the groupBy shuffle once
        and cross into Python as Arrow batches."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, mx DOUBLE")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            prev = self._agg.get()
            n, mx = (prev[0], prev[1]) if prev is not None else (0, float("-inf"))
            for pdf in rows:
                if len(pdf):
                    n += len(pdf)
                    mx = max(mx, float(pdf["value"].max()))
            self._agg.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover - pyspark < 4 fallback
    RunningUserAgg = None  # type: ignore[assignment]


def running_user_agg_stream(events: DataFrame) -> DataFrame:
    """Running per-user feature row via ``transformWithStateInPandas``
    (requires the RocksDB state store provider — see
    ``tests/test_stateful_streaming.py`` for the session conf)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningUserAgg(),
        outputStructType="user_id long, n_events long, max_value double",
        outputMode="Update",
        timeMode="None",
    )
