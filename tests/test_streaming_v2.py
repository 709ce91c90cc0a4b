"""Spark-4 v2 stateful API (transformWithStateInPandas) coverage.

The container lacks the ``protobuf`` package the v2 Python state
server needs, so the end-to-end test self-skips here; the processor's
fold/timer semantics — the part this repo owns — are driven directly
through fake handles against the same scenario (and the same batch
``session_window`` twin) the v1 operator's end-to-end test uses.
"""

from __future__ import annotations

import datetime as dt
import importlib.util

import pandas as pd
import pytest

from bigdata_commerce_spark.streaming.stateful_v2 import GapSessionProcessor

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeHandle:
    def __init__(self):
        self._states = {}
        self.timers = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self._states.setdefault(name, FakeValueState())

    def registerTimer(self, ts):
        self.timers.add(ts)

    def deleteTimer(self, ts):
        self.timers.discard(ts)

    def listTimers(self):
        return iter(list(self.timers))


class FakeTimerValues:
    def __init__(self, wm_ms):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm

    def getCurrentProcessingTimeInMs(self):
        return 0


class FakeExpiredTimerInfo:
    def __init__(self, ts):
        self._ts = ts

    def getExpiryTimeInMs(self):
        return self._ts


class Harness:
    """Micro-batch driver reproducing the runtime's contract: per-key
    state/timers, watermark = max event time - delay, timers fire when
    the watermark passes their expiry."""

    def __init__(self, gap_seconds, watermark_delay_ms=1000):
        self.gap = gap_seconds
        self.delay = watermark_delay_ms
        self.procs: dict[int, GapSessionProcessor] = {}
        self.handles: dict[int, FakeHandle] = {}
        self.wm = 0
        self.out: list[pd.DataFrame] = []

    def _proc(self, key):
        if key not in self.procs:
            p = GapSessionProcessor(self.gap)
            h = FakeHandle()
            p.init(h)
            self.procs[key], self.handles[key] = p, h
        return self.procs[key], self.handles[key]

    def feed(self, rows):  # rows: [(datetime, user_id)]
        by_key: dict[int, list] = {}
        max_ms = 0
        for ts, uid in rows:
            by_key.setdefault(uid, []).append(ts)
            max_ms = max(max_ms, int(ts.timestamp() * 1000))
        tv = FakeTimerValues(self.wm)
        for uid, tss in by_key.items():
            p, _h = self._proc(uid)
            pdf = pd.DataFrame({"event_time": pd.Series(tss, dtype="datetime64[ns]")})
            self.out.extend(p.handleInputRows((uid,), iter([pdf]), tv))
        # watermark advances after the batch; then due timers fire
        self.wm = max(self.wm, max_ms - self.delay)
        for uid, h in self.handles.items():
            for ts in sorted(h.timers):
                if ts <= self.wm:
                    h.deleteTimer(ts)
                    self.out.extend(
                        self.procs[uid].handleExpiredTimer(
                            (uid,), FakeTimerValues(self.wm), FakeExpiredTimerInfo(ts)
                        )
                    )

    def sessions(self):
        if not self.out:
            return set()
        allout = pd.concat(self.out)
        return {
            (r.user_id, r.session_start.to_pydatetime(), r.session_end.to_pydatetime(), r.n_events)
            for r in allout.itertuples()
        }


def s(sec):
    return BASE + dt.timedelta(seconds=sec)


def test_v2_processor_matches_batch_session_window(spark):
    """Same scenario as the v1 end-to-end test: in-batch splits,
    cross-batch merges, timer-driven emission — output must equal the
    batch session_window twin."""
    from pyspark.sql import functions as F

    chunk1 = [(s(0), 1), (s(10), 1), (s(20), 1), (s(5), 2)]
    chunk2 = [(s(3600), 1), (s(3610), 1), (s(30), 2), (s(3600), 3)]
    h = Harness(gap_seconds=60)
    h.feed(chunk1)
    h.feed(chunk2)
    h.feed([(s(36000), 99)])
    h.feed([(s(36002), 99)])

    got = {x for x in h.sessions() if x[0] != 99}
    twin = (
        spark.createDataFrame(chunk1 + chunk2, "event_time timestamp, user_id long")
        .groupBy("user_id", F.session_window("event_time", "60 seconds"))
        .agg(
            F.min("event_time").alias("session_start"),
            F.max("event_time").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    expected = {(r.user_id, r.session_start, r.session_end, r.n_events) for r in twin}
    assert got == expected
    assert len(expected) == 4


def test_v2_processor_one_live_timer_per_key():
    """Stale timers are deleted on every update — timer count stays
    bounded by active keys, not by update count."""
    h = Harness(gap_seconds=60)
    for i in range(5):
        h.feed([(s(i * 10), 7)])
    assert len(h.handles[7].timers) == 1


def test_v2_processor_expired_timer_without_state_is_noop():
    h = Harness(gap_seconds=60)
    p, handle = h._proc(1)
    out = list(
        p.handleExpiredTimer((1,), FakeTimerValues(10_000), FakeExpiredTimerInfo(5_000))
    )
    assert out == []


def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs the protobuf package "
    "(absent in this container); processor logic is covered above",
)
def test_v2_end_to_end(spark, tmp_path):
    import shutil

    from pyspark.sql import functions as F

    from bigdata_commerce_spark.streaming.stateful_v2 import user_sessions_stateful_v2

    flat = tmp_path / "flat"
    flat.mkdir()
    schema = "event_time timestamp, user_id long"

    def write_chunk(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        part = next((tmp_path / name).glob("part-*.parquet"))
        shutil.copy(part, flat / f"{name}.parquet")

    chunk1 = [(s(0), 1), (s(10), 1), (s(20), 1), (s(5), 2)]
    chunk2 = [(s(3600), 1), (s(3610), 1), (s(30), 2), (s(3600), 3)]
    write_chunk("c1", chunk1)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q = (
        user_sessions_stateful_v2(stream, gap_seconds=60, watermark="1 second")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("v2_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    for name, rows in (
        ("c2", chunk2),
        ("f1", [(s(36000), 99)]),
        ("f2", [(s(36002), 99)]),
    ):
        write_chunk(name, rows)
        q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM v2_sessions").collect()
        if r.user_id != 99
    }
    twin = (
        spark.createDataFrame(chunk1 + chunk2, schema)
        .groupBy("user_id", F.session_window("event_time", "60 seconds"))
        .agg(
            F.min("event_time").alias("session_start"),
            F.max("event_time").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    expected = {(r.user_id, r.session_start, r.session_end, r.n_events) for r in twin}
    assert got == expected
