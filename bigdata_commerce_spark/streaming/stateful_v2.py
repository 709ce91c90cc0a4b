"""Gap sessionization on Spark 4's arbitrary-stateful v2 API
(``transformWithStateInPandas`` + ``StatefulProcessor``).

Same operator contract as ``streaming/stateful.py`` (the
``applyInPandasWithState`` form): per-user gap sessions, emitted
either when a later event proves the gap (in-batch) or when the
event-time watermark passes ``last_event + gap`` (via a registered
timer). The v2 API splits the v1 ``hasTimedOut`` re-entry into an
explicit ``handleExpiredTimer`` callback and replaces the single
typed state tuple with named state variables — which is what makes
it the forward path: one processor can hold several states (value /
list / map) and several timers per key.

Scale shape is identical to v1: state is one small tuple per ACTIVE
user, micro-batches shuffle only their own rows by key, and timer
count is bounded by active keys (stale timers are deleted on every
update, not left to fire into a guard).

Environment note: executing transformWithStateInPandas requires the
``protobuf`` Python package (the v2 state server speaks proto between
JVM and the Python worker), which this container does not ship. The
processor's fold/timer logic is therefore unit-tested directly
against fake handles (tests/test_streaming_v2.py) — the same
semantics the v1 operator's end-to-end test pins — and the
integration test self-skips when protobuf is absent.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from bigdata_commerce_spark.streaming.stateful import SESSION_OUT_SCHEMA

_STATE_SCHEMA = "start_ms long, last_ms long, n long"


def _emit(user_id: Any, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in sessions],
            "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in sessions],
            "n_events": [n for _, _, n in sessions],
        }
    )


class GapSessionProcessor(StatefulProcessor):
    """Fold events into the open session; emit on proven gap or timer."""

    def __init__(self, gap_seconds: int, time_col: str = "event_time") -> None:
        self._gap_ms = gap_seconds * 1000
        self._time_col = time_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._session = handle.getValueState("session", _STATE_SCHEMA)

    def handleInputRows(
        self,
        key: tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        ts = pd.concat([pdf[self._time_col] for pdf in rows]).sort_values()
        start_ms = last_ms = None
        n = 0
        if self._session.exists():
            start_ms, last_ms, n = self._session.get()
        completed: list[tuple[int, int, int]] = []
        for t in ts:
            t_ms = t.value // 1_000_000
            if start_ms is None:
                start_ms, last_ms, n = t_ms, t_ms, 1
            elif t_ms - last_ms > self._gap_ms:
                completed.append((start_ms, last_ms, n))
                start_ms, last_ms, n = t_ms, t_ms, 1
            else:
                last_ms, n = max(last_ms, t_ms), n + 1
        self._session.update((start_ms, last_ms, n))
        # One live timer per key: drop stale ones instead of letting
        # them fire into a guard (timer count stays == active keys).
        for stale in self._handle.listTimers():
            self._handle.deleteTimer(stale)
        # Event-time timers must sit strictly beyond the current
        # watermark or they'd never be considered "in the future".
        self._handle.registerTimer(
            max(last_ms + self._gap_ms, timerValues.getCurrentWatermarkInMs() + 1)
        )
        if completed:
            yield _emit(key[0], completed)

    def handleExpiredTimer(
        self,
        key: tuple[Any, ...],
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        if not self._session.exists():
            return
        start_ms, last_ms, n = self._session.get()
        # The watermark has passed last+gap (timers only fire once the
        # watermark crosses their expiry): the session is complete.
        if expiredTimerInfo.getExpiryTimeInMs() >= last_ms + self._gap_ms:
            self._session.clear()
            yield _emit(key[0], [(start_ms, last_ms, n)])

    def close(self) -> None:
        pass


def user_sessions_stateful_v2(
    events: DataFrame,
    gap_seconds: int = 60,
    watermark: str = "1 second",
    time_col: str = "event_time",
    key_col: str = "user_id",
) -> DataFrame:
    """v2-API twin of ``stateful.user_sessions_stateful`` — identical
    output contract, checked equal in tests."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .transformWithStateInPandas(
            GapSessionProcessor(gap_seconds, time_col),
            SESSION_OUT_SCHEMA,
            "append",
            "eventTime",
        )
    )
