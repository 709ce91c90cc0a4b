"""Structured Streaming tests: the req 7-10 topology driven by a file
source (one micro-batch per file), checked against batch twins over
the same rows, plus sink idempotency under epoch replay."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

# Suite tiering (VERDICT r10 item 7, extended after measuring the
# round-11 durations): the streaming e2e suite (checkpointed queries, restart-recovery, sink merges)
# is wall-dominant — the full `pytest tests/` run keeps it;
# `-m "not slow"` gives the fast development signal.
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from bigdata_commerce_spark.operators.topk import top_k_per_group
from bigdata_commerce_spark.sources.testdata import load_table
from bigdata_commerce_spark.streaming import ad_stream, pipelines, sinks
from tests.conftest import SF_SMOKE

SCRATCH = Path(__file__).resolve().parent.parent / ".scratch" / "streaming"


def _ad_events(spark):
    """events testdata mapped to the ad-event schema, time-ordered."""
    ev = load_table(spark, "events", SF_SMOKE)
    return (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("ts").alias("event_time"),
            F.to_date("ts").alias("event_date"),
            F.concat(F.lit("p"), (F.col("user_id") % 10).cast("string")).alias("province"),
            F.concat(F.lit("c"), (F.col("user_id") % 100).cast("string")).alias("city"),
            F.col("user_id"),
            F.get_json_object("props", "$.k").cast("bigint").alias("ad_id"),
        )
        .orderBy("event_time")
    )


@pytest.fixture(scope="module")
def stream_result(spark):
    """Run the full pipeline over 3 micro-batches; yield state dirs."""
    if SCRATCH.exists():
        shutil.rmtree(SCRATCH)
    src = SCRATCH / "source"
    organic = _ad_events(spark)
    # Planted burst: user 9999 clicks ad 1 twice per chunk -> crosses
    # the >2 threshold only once the second chunk's counts accumulate,
    # proving cross-batch additive state (not per-batch counts).
    first_time = organic.first()
    burst_row = (
        first_time.event_time,
        first_time.event_date,
        "p9",
        "c99",
        9999,
        1,
    )
    rows = organic.collect()
    third = len(rows) // 3
    chunks = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    # Two burst clicks per chunk, all three chunks. Counts cross the
    # >3 threshold when batch 2's counts accumulate (2 -> 4), so the
    # user is blacklisted from batch 3 on — chunk 3's two burst rows
    # are written to the source but must be EXCLUDED from every state
    # table by the in-topology blacklist filter. `events` below is the
    # *effective* row set (organic + chunks 1-2's bursts): the batch
    # twins assert state equals aggregation over exactly these rows.
    for chunk in chunks:
        chunk.extend([burst_row, burst_row])
    events = spark.createDataFrame(
        [tuple(r) for r in rows] + [burst_row] * 4, ad_stream.AD_EVENT_SCHEMA
    ).cache()
    events.count()
    # Full written source (organic + all 6 bursts) — for twins of
    # standalone streams that run WITHOUT the blacklist filter.
    source_events = spark.createDataFrame(
        [tuple(r) for r in rows] + [burst_row] * 6, ad_stream.AD_EVENT_SCHEMA
    ).cache()
    source_events.count()
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, ad_stream.AD_EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"chunk_{i}"))
    # move chunk files into one flat dir so maxFilesPerTrigger=1 gives
    # one batch per chunk
    flat = SCRATCH / "flat"
    flat.mkdir(parents=True)
    for i in range(3):
        part = next((src / f"chunk_{i}").glob("part-*.parquet"))
        shutil.copy(part, flat / f"{i:02d}.parquet")

    stream = pipelines.file_event_source(spark, str(flat))
    handles = pipelines.run_ad_pipeline(
        stream, str(SCRATCH / "state"), blacklist_threshold=3
    )
    handles.process_all()
    handles.stop()
    yield {"events": events, "source_events": source_events, "handles": handles}
    events.unpersist()
    source_events.unpersist()


def test_cumulative_state_matches_batch(spark, stream_result):
    events = stream_result["events"]
    handles = stream_result["handles"]
    got = sinks.read_state(spark, handles.cumulative_dir)
    expected = events.groupBy("event_date", "province", "city", "ad_id").agg(
        F.count(F.lit(1)).alias("click_count")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_user_counts_accumulate_across_batches(spark, stream_result):
    events = stream_result["events"]
    handles = stream_result["handles"]
    got = sinks.read_state(spark, handles.user_counts_dir)
    expected = events.groupBy("event_date", "user_id", "ad_id").agg(
        F.count(F.lit(1)).alias("click_count")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_blacklist_matches_batch_threshold(spark, stream_result):
    events = stream_result["events"]
    handles = stream_result["handles"]
    got = {r.user_id for r in sinks.read_state(spark, handles.blacklist_dir).collect()}
    expected = {
        r.user_id
        for r in events.groupBy("event_date", "user_id", "ad_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 3)
        .select("user_id")
        .distinct()
        .collect()
    }
    assert got == expected
    assert 9999 in got, "planted burst user must cross the threshold"


def test_province_top3_matches_batch(spark, stream_result):
    events = stream_result["events"]
    handles = stream_result["handles"]
    got = sinks.read_state(spark, handles.top3_dir)
    counts = events.groupBy("event_date", "province", "ad_id").agg(
        F.count(F.lit(1)).alias("click_count")
    )
    expected = top_k_per_group(
        counts, ["event_date", "province"], [F.desc("click_count"), F.asc("ad_id")], k=3
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_trend_windows_match_batch(spark, stream_result):
    events = stream_result["events"]
    handles = stream_result["handles"]
    got = sinks.read_state(spark, handles.trend_dir)
    expected = (
        events.groupBy(F.window("event_time", "60 minutes", "1 minute"), "ad_id")
        .agg(F.count(F.lit(1)).alias("click_count"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "ad_id",
            "click_count",
        )
    )
    assert got.count() == expected.count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_blacklisted_user_later_clicks_excluded(spark, stream_result):
    """The in-topology feedback loop (``AdverStat.scala:54-69``): user
    9999 is blacklisted after batch 2, so the two batch-3 burst clicks
    in the source must not reach user_counts/cumulative state."""
    handles = stream_result["handles"]
    uc = sinks.read_state(spark, handles.user_counts_dir)
    assert uc.where(F.col("user_id") == 9999).agg(
        F.sum("click_count")
    ).collect()[0][0] == 4  # 6 written to the source, 2 post-blacklist
    cum = sinks.read_state(spark, handles.cumulative_dir)
    assert cum.where(
        (F.col("province") == "p9") & (F.col("city") == "c99")
    ).agg(F.sum("click_count")).collect()[0][0] == 4


def test_update_mode_stateful_agg_matches_batch(spark, stream_result):
    """ad_stream.cumulative_counts as a real update-mode stateful
    aggregation wired to an overwrite-by-key sink equals the batch
    twin (the updateStateByKey surface, independent of the pipeline's
    sink-side accumulation)."""
    state_dir = str(SCRATCH / "state" / "cumulative_updmode")
    stream = pipelines.file_event_source(spark, str(SCRATCH / "flat"))
    sink = sinks.overwrite_sink(
        state_dir, ["event_date", "province", "city", "ad_id"]
    )
    q = (
        ad_stream.cumulative_counts(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(SCRATCH / "state" / "ckpt" / "updmode"))
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sinks.read_state(spark, state_dir)
    # no blacklist filter on this standalone query -> all 6 burst rows
    expected = stream_result["source_events"].groupBy(
        "event_date", "province", "city", "ad_id"
    ).agg(F.count(F.lit(1)).alias("click_count"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_parse_ad_log(spark):
    lines = spark.createDataFrame(
        [("1704067200000 p1 c11 42 7",), ("1704067205000 p2 c22 43 9",)], "value string"
    )
    rows = ad_stream.parse_ad_log(lines).collect()
    assert rows[0].province == "p1"
    assert rows[0].user_id == 42 and rows[0].ad_id == 7
    assert rows[0].event_time.isoformat().startswith("2024-01-01")
    assert rows[0].event_date.isoformat() == "2024-01-01"


def test_parse_ad_log_poison_line_does_not_abort(spark):
    """One malformed wire line must parse to NULL fields, not
    ANSI-abort the micro-batch: a restarted stream re-reads the SAME
    poisoned offset and dies again, wedging the pipeline permanently.
    Valid lines in the same batch survive untouched."""
    lines = spark.createDataFrame(
        [
            ("1704067200000 p1 c11 42 7",),
            ("not-a-timestamp p9 c99 abc xyz",),  # poison
            ("",),                                # empty line
            ("1704067205000 p2 c22 43 9",),
        ],
        "value string",
    )
    rows = ad_stream.parse_ad_log(lines).collect()
    assert len(rows) == 4
    good = [r for r in rows if r.ad_id is not None]
    assert {(r.user_id, r.ad_id) for r in good} == {(42, 7), (43, 9)}
    poisoned = [r for r in rows if r.ad_id is None]
    assert all(r.event_time is None and r.user_id is None for r in poisoned)


def test_sink_epoch_replay_is_idempotent(spark, tmp_path):
    """Re-running the same epoch (micro-batch retry) must not change
    state — the guarantee the reference's JDBC DAOs lack."""
    state = str(tmp_path / "state")
    sink = sinks.accumulate_sink(state, ["k"], "v")
    batch = spark.createDataFrame([("a", 1), ("a", 2), ("b", 5)], "k string, v long")
    sink(batch, 0)
    first = sorted(map(tuple, sinks.read_state(spark, state).collect()))
    sink(batch, 0)  # replay epoch 0
    second = sorted(map(tuple, sinks.read_state(spark, state).collect()))
    assert first == second == [("a", 3), ("b", 5)]
    sink(batch, 1)  # genuine next epoch accumulates
    third = sorted(map(tuple, sinks.read_state(spark, state).collect()))
    assert third == [("a", 6), ("b", 10)]


def test_sink_epoch_retention(spark, tmp_path):
    """Old epochs are pruned after each commit (keeping KEEP_EPOCHS for
    replay) so state dirs don't grow as epochs x full-state size."""
    import os

    state = str(tmp_path / "state")
    sink = sinks.accumulate_sink(state, ["k"], "v")
    batch = spark.createDataFrame([("a", 1)], "k string, v long")
    for e in range(6):
        sink(batch, e)
    kept = sorted(d for d in os.listdir(state) if d.startswith("epoch="))
    assert kept == [f"epoch={e}" for e in range(6 - sinks.KEEP_EPOCHS, 6)]
    # replay of the newest epoch still possible: predecessor retained
    sink(batch, 5)
    assert sorted(map(tuple, sinks.read_state(spark, state).collect())) == [("a", 6)]


def test_kafka_source_builder_wiring(spark):
    """kafka_event_source is the one-call production entry; without
    the connector jar it must fail with the exact guidance (the parse
    wiring itself is parse_ad_log, covered by test_parse_ad_log)."""
    with pytest.raises(RuntimeError, match="spark-sql-kafka-0-10"):
        pipelines.kafka_event_source(spark, "broker:9092", "ad_events")


def test_blacklisted_users_filtered_from_stream(spark):
    events = _ad_events(spark).limit(100)
    bl = spark.createDataFrame([(int(events.first().user_id),)], "user_id long")
    remaining = ad_stream.without_blacklisted(events, bl)
    assert remaining.where(remaining.user_id == bl.first().user_id).count() == 0
    assert remaining.count() < 100


def test_session_window_stream_matches_batch_gaps(spark, stream_result):
    """Streaming session_window(gap) totals == batch gap sessionization
    over the same rows (complete output after all data seen)."""
    import shutil as _shutil

    from bigdata_commerce_spark.operators.sessionize import session_aggregates, sessionize

    events = stream_result["source_events"]  # no blacklist filter here
    src = str(SCRATCH / "flat")
    out_ckpt = str(SCRATCH / "state" / "ckpt" / "session_window")
    stream = pipelines.file_event_source(spark, src)
    agg = ad_stream.session_window_counts(stream, gap="30 minutes", watermark="365 days")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_win")
        .option("checkpointLocation", out_ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT user_id, n_events FROM sess_win ORDER BY user_id, session_start"
    ).collect()
    batch = session_aggregates(
        sessionize(
            events.select("user_id", F.col("event_time").alias("ts")), gap_minutes=30
        ),
        ts_col="ts",
    ).orderBy("user_id", "start_time")
    expected = [(r.user_id, r.step_length) for r in batch.collect()]
    assert [(r.user_id, r.n_events) for r in got] == expected


def test_watermark_drops_late_data(spark, tmp_path):
    """An event arriving far behind the watermark must be excluded
    from the windowed aggregation (the late-data policy the reference
    lacks entirely — SURVEY.md §2.9)."""
    import datetime as dt

    from pyspark.sql import functions as F2

    flat = tmp_path / "flat"
    flat.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_chunk(name, rows):
        spark.createDataFrame(rows, ad_stream.AD_EVENT_SCHEMA).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        part = next((tmp_path / name).glob("part-*.parquet"))
        shutil.copy(part, flat / f"{name}.parquet")

    def ev(ts, user=1, ad=1):
        return (ts, ts.date(), "p1", "c1", user, ad)

    # batch 1 advances event time to 12:30 (watermark -> 12:20)
    write_chunk("b1", [ev(base), ev(base + dt.timedelta(minutes=30))])

    stream = (
        spark.readStream.schema(ad_stream.AD_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    agg = ad_stream.minute_window_trend(stream, watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()  # watermark now trails the 12:30 max by 10min

    # batch 2, delivered strictly after batch 1 committed: one fresh
    # event + one 2 hours late (far behind the watermark)
    late = base - dt.timedelta(hours=2)
    write_chunk("b2", [ev(base + dt.timedelta(minutes=31)), ev(late, user=99, ad=99)])
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM late_test").collect()
    # the 2h-late event (ad 99) must not appear in any emitted window
    assert not [r for r in rows if r.ad_id == 99], rows


def test_stateful_sessions_match_batch_session_window(spark, tmp_path):
    """applyInPandasWithState gap sessionization (streaming/stateful.py)
    must emit exactly the sessions F.session_window computes in batch:
    same gap-merge semantics, emission driven by the event-time
    watermark timeout. A far-future sentinel user advances the
    watermark so every real session provably completes."""
    import datetime as dt

    from bigdata_commerce_spark.streaming.stateful import user_sessions_stateful

    flat = tmp_path / "flat"
    flat.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "event_time timestamp, user_id long"

    def write_chunk(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        part = next((tmp_path / name).glob("part-*.parquet"))
        shutil.copy(part, flat / f"{name}.parquet")

    def s(sec):
        return base + dt.timedelta(seconds=sec)

    chunk1 = [(s(0), 1), (s(10), 1), (s(20), 1), (s(5), 2)]
    # u1's hour-later events split a session INSIDE a batch; u2's 00:30
    # merges with its open session (25s gap < 60s); u3 opens fresh.
    chunk2 = [(s(3600), 1), (s(3610), 1), (s(30), 2), (s(3600), 3)]
    sentinel1 = [(s(36000), 99)]
    sentinel2 = [(s(36002), 99)]  # fires the timeouts (watermark ~ 09:59:59)

    write_chunk("c1", chunk1)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q = (
        user_sessions_stateful(stream, gap_seconds=60, watermark="1 second")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stateful_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    for name, rows in (("c2", chunk2), ("f1", sentinel1), ("f2", sentinel2)):
        write_chunk(name, rows)
        q.processAllAvailable()
    q.stop()

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM stateful_sessions").collect()
        if r.user_id != 99
    }
    batch_events = spark.createDataFrame(chunk1 + chunk2, schema)
    twin = (
        batch_events.groupBy(
            "user_id", F.session_window("event_time", "60 seconds")
        )
        .agg(
            F.min("event_time").alias("session_start"),
            F.max("event_time").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in twin
    }
    assert got == expected
    assert len(expected) == 4  # u1 x2, u2 x1, u3 x1


def test_ad_pipeline_on_jdbc_backend_matches_parquet(spark, stream_result, tmp_path):
    """The full reqs 7-10 topology on the JDBC MERGE backend (embedded
    Derby) must land the same state the parquet epoch backend did for
    the identical chunked source — including the blacklist feedback
    behavior (user 9999 capped at 4, not 6)."""
    from bigdata_commerce_spark.streaming.jdbc_state import JdbcStateBackend
    from bigdata_commerce_spark.sources.sinks import derby_config

    backend = JdbcStateBackend(spark, derby_config(str(tmp_path / "addb")))
    stream = pipelines.file_event_source(spark, str(SCRATCH / "flat"))
    handles = pipelines.run_ad_pipeline(
        stream,
        str(tmp_path / "work"),
        blacklist_threshold=3,
        backend=backend,
    )
    handles.process_all()
    handles.stop()

    pq = stream_result["handles"]
    for name, keys in (
        ("user_counts", ["event_date", "user_id", "ad_id", "click_count"]),
        ("cumulative", ["event_date", "province", "city", "ad_id", "click_count"]),
        ("blacklist", ["user_id"]),
        ("top3", ["event_date", "province", "ad_id", "click_count", "rank"]),
        ("trend", ["window_start", "window_end", "ad_id", "click_count"]),
    ):
        jd = backend.read_state(name).select(*keys)
        pd_ = pq.backend.read_state(name).select(*keys)
        got = sorted(map(tuple, jd.collect()))
        want = sorted(map(tuple, pd_.collect()))
        assert got == want, f"{name}: jdbc != parquet"
    bl = {r.user_id for r in backend.read_state("blacklist").collect()}
    assert 9999 in bl


def test_ad_pipeline_soak_six_batches_with_midrun_restart(spark, tmp_path):
    """Soak of the full reqs 7-10 topology (ref AdverStat.scala:76-90
    runs all four outputs off one stream): SIX micro-batches through
    all four sinks concurrently, the query killed after batch 3 and
    restarted from its checkpoint, remaining files processed by the
    resumed query. Every state table must equal its batch twin over
    the effective rows — restart must neither lose batches 0-2 nor
    replay them into the additive sinks (the epoch ledger's job).

    Burst user 9999 clicks twice per chunk with threshold 3: counts
    cross after batch 1, so the in-topology feedback filter drops the
    user from batch 2 onward — only chunks 0-1's four burst rows are
    effective, and the blacklisting straddles the restart."""
    organic = _ad_events(spark)
    first = organic.first()
    burst_row = (first.event_time, first.event_date, "p9", "c99", 9999, 1)
    rows = organic.collect()
    n_chunks = 6
    step = len(rows) // n_chunks
    chunks = [rows[i * step : (i + 1) * step] for i in range(n_chunks - 1)]
    chunks.append(rows[(n_chunks - 1) * step :])
    for chunk in chunks:
        chunk.extend([burst_row, burst_row])

    flat = tmp_path / "flat"
    flat.mkdir()
    def _land(i):
        chunk_dir = tmp_path / f"chunk_{i}"
        spark.createDataFrame(chunks[i], ad_stream.AD_EVENT_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(str(chunk_dir))
        shutil.copy(next(chunk_dir.glob("part-*.parquet")), flat / f"{i:02d}.parquet")

    work = str(tmp_path / "state")
    for i in range(3):
        _land(i)
    handles = pipelines.run_ad_pipeline(
        pipelines.file_event_source(spark, str(flat)),
        work,
        blacklist_threshold=3,
    )
    handles.process_all()
    handles.stop()  # mid-run kill after 3 of 6 batches

    for i in range(3, n_chunks):
        _land(i)
    resumed = pipelines.run_ad_pipeline(
        pipelines.file_event_source(spark, str(flat)),
        work,
        blacklist_threshold=3,
    )
    resumed.process_all()
    resumed.stop()

    # effective rows: organic + the 4 pre-blacklist burst clicks
    events = spark.createDataFrame(
        [tuple(r) for r in rows] + [burst_row] * 4, ad_stream.AD_EVENT_SCHEMA
    ).cache()
    try:
        got_counts = sinks.read_state(spark, resumed.user_counts_dir)
        want_counts = events.groupBy("event_date", "user_id", "ad_id").agg(
            F.count(F.lit(1)).alias("click_count")
        )
        assert sorted(map(tuple, got_counts.collect())) == sorted(
            map(tuple, want_counts.collect())
        )

        got_cum = sinks.read_state(spark, resumed.cumulative_dir)
        want_cum = events.groupBy("event_date", "province", "city", "ad_id").agg(
            F.count(F.lit(1)).alias("click_count")
        )
        assert sorted(map(tuple, got_cum.collect())) == sorted(
            map(tuple, want_cum.collect())
        )

        bl = {r.user_id for r in sinks.read_state(spark, resumed.blacklist_dir).collect()}
        want_bl = {
            r.user_id
            for r in events.groupBy("event_date", "user_id", "ad_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 3)
            .collect()
        }
        assert bl == want_bl and 9999 in bl

        got_top3 = sinks.read_state(spark, resumed.top3_dir)
        counts = events.groupBy("event_date", "province", "ad_id").agg(
            F.count(F.lit(1)).alias("click_count")
        )
        want_top3 = top_k_per_group(
            counts,
            ["event_date", "province"],
            [F.desc("click_count"), F.asc("ad_id")],
            k=3,
        )
        assert sorted(map(tuple, got_top3.collect())) == sorted(
            map(tuple, want_top3.collect())
        )

        got_trend = sinks.read_state(spark, resumed.trend_dir)
        want_trend = (
            events.groupBy(F.window("event_time", "60 minutes", "1 minute"), "ad_id")
            .agg(F.count(F.lit(1)).alias("click_count"))
            .select(
                F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "ad_id",
                "click_count",
            )
        )
        assert sorted(map(tuple, got_trend.collect())) == sorted(
            map(tuple, want_trend.collect())
        )
    finally:
        events.unpersist()


def test_jsonl_stream_fingerprints_match_batch(spark, tmp_path):
    """Streaming ingest of JSONL shards -> fingerprint -> distinct
    sink must converge to exactly the batch doc_fingerprints result
    over the same corpus (incremental exact dedup over arriving
    shards)."""
    import json as _json

    from bigdata_commerce_spark.operators import text as text_ops

    docs = load_table(spark, "documents", SF_SMOKE).limit(60).collect()
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    # two JSONL shards, written as the stream source's files directly
    for i, half in enumerate((docs[:30], docs[30:])):
        with open(shard_dir / f"shard_{i}.jsonl", "w") as f:
            for r in half:
                f.write(_json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")

    stream = pipelines.jsonl_document_source(spark, str(shard_dir))
    sink = sinks.distinct_append_sink(str(tmp_path / "state"), ["doc_id", "fp"])
    q = (
        stream.select("doc_id", text_ops.fingerprint("text").alias("fp"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_id, r.fp)
        for r in sinks.read_state(spark, str(tmp_path / "state")).collect()
    }
    batch = spark.createDataFrame(docs, load_table(spark, "documents", SF_SMOKE).schema)
    expected = {
        (r.doc_id, r.fp)
        for r in batch.select(
            "doc_id", text_ops.fingerprint("text").alias("fp")
        ).collect()
    }
    assert got == expected and len(got) == 60


def test_stream_dedup_within_watermark_drops_cross_batch_dupes(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps the first arrival per key and
    drops re-arrivals in LATER micro-batches (state spans batches);
    result equals batch dropDuplicates over the same rows."""
    import datetime as dt

    from bigdata_commerce_spark.streaming.dedup_stream import dedup_exact_stream

    flat = tmp_path / "flat"
    flat.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_chunk(name, rows):
        spark.createDataFrame(rows, ad_stream.AD_EVENT_SCHEMA).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        part = next((tmp_path / name).glob("part-*.parquet"))
        shutil.copy(part, flat / f"{name}.parquet")

    def ev(ts, user, ad):
        return (ts, ts.date(), "p1", "c1", user, ad)

    write_chunk("b1", [ev(base, 1, 1), ev(base + dt.timedelta(minutes=1), 2, 2)])
    stream = pipelines.file_event_source(spark, str(flat))
    deduped = dedup_exact_stream(stream, ["user_id", "ad_id"], within="1 hour")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # batch 2, strictly after batch 1 committed: a replay of (1, 1)
    # well inside the 1h horizon, plus a genuinely new key
    write_chunk(
        "b2",
        [ev(base + dt.timedelta(minutes=2), 1, 1), ev(base + dt.timedelta(minutes=3), 3, 3)],
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.user_id, r.ad_id)
        for r in spark.sql("SELECT user_id, ad_id FROM stream_dedup").collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_distinct_documents_stream_emits_each_content_once(spark, tmp_path):
    """Global streaming content dedup over JSONL shard ingest: every
    distinct text body emitted exactly once even when the duplicate
    arrives in a later shard; fingerprint set matches the batch
    exact-dedup operator over the same corpus."""
    import json as _json

    from bigdata_commerce_spark.operators.dedup import exact_duplicates
    from bigdata_commerce_spark.sources.formats import DOCUMENTS_SCHEMA
    from bigdata_commerce_spark.streaming.dedup_stream import distinct_documents_stream

    corpus = [
        (1, "alpha beta gamma"),
        (2, "delta epsilon zeta"),
        (3, "alpha beta gamma"),  # dup of 1, same shard
        (4, "eta theta iota"),
        (5, "delta epsilon zeta"),  # dup of 2, later shard
        (6, "alpha beta gamma"),  # dup of 1, later shard
        (7, "kappa lambda mu"),
    ]
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for i, shard in enumerate((corpus[:4], corpus[4:])):
        with open(shard_dir / f"shard_{i}.jsonl", "w") as f:
            for doc_id, text in shard:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    stream = pipelines.jsonl_document_source(spark, str(shard_dir))
    q = (
        distinct_documents_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("doc_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT doc_id, fp FROM doc_dedup").collect()
    batch = spark.createDataFrame(
        [(i, t) for i, t in corpus], DOCUMENTS_SCHEMA
    )
    expected_fps = {r.fp for r in exact_duplicates(batch).select("fp").collect()}
    assert {r.fp for r in rows} == expected_fps
    assert len(rows) == len(expected_fps)  # exactly once per content
    # each survivor must actually carry its content's text
    text_of = dict(corpus)
    from bigdata_commerce_spark.operators.text import fingerprint as _fp

    fp_by_text = {
        r.text: r.fp
        for r in batch.select("text", _fp("text").alias("fp")).distinct().collect()
    }
    for r in rows:
        assert fp_by_text[text_of[r.doc_id]] == r.fp


def test_stateful_ewma_stream_bit_identical_to_batch(spark, tmp_path):
    """Streaming EWMA (streaming/stateful.ewma_stateful) across three
    in-order micro-batches must equal the batch fold
    (timeseries.ewma_per_key) BIT-for-bit — same IEEE op order, state
    threaded across batches; a late row behind the state is dropped."""
    import datetime as dt

    from bigdata_commerce_spark.operators.timeseries import ewma_per_key
    from bigdata_commerce_spark.streaming.stateful import ewma_stateful

    flat = tmp_path / "flat"
    flat.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "event_time timestamp, user_id long, value double"

    def write_chunk(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        part = next((tmp_path / name).glob("part-*.parquet"))
        shutil.copy(part, flat / f"{name}.parquet")

    def s(sec):
        return base + dt.timedelta(seconds=sec)

    chunks = [
        [(s(0), 1, 10.0), (s(10), 1, 20.0), (s(5), 2, 1.0)],
        [(s(20), 1, 5.0), (s(15), 2, 2.0), (s(25), 2, 3.0)],
        [(s(30), 1, 100.0), (s(1), 2, 99.0)],  # (s(1), 2) is LATE: dropped
    ]
    write_chunk("c1", chunks[0])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q = (
        ewma_stateful(stream, alpha=0.3)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stateful_ewma")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    for i, rows in enumerate(chunks[1:], start=2):
        write_chunk(f"c{i}", rows)
        q.processAllAvailable()
    q.stop()

    got = {
        (r.user_id, r.event_time): r.ewma
        for r in spark.sql("select * from stateful_ewma").collect()
    }
    in_order = [r for ch in chunks for r in ch if r != (s(1), 2, 99.0)]
    batch = ewma_per_key(
        spark.createDataFrame(in_order, schema),
        alpha=0.3,
        key_col="user_id",
        ts_col="event_time",
        value_col="value",
    )
    want = {(r["user_id"], r["event_time"]): r["ewma"] for r in batch.collect()}
    assert got == want  # BIT identical, late row absent from both


def test_stateful_ewma_tie_contract(spark, tmp_path):
    """Equal timestamps INSIDE a batch fold in (ts, value) order like
    the batch path; an equal timestamp arriving in a LATER batch is
    at-or-behind prior state and is dropped."""
    import datetime as dt

    from bigdata_commerce_spark.streaming.stateful import ewma_stateful

    flat = tmp_path / "flat"
    flat.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "event_time timestamp, user_id long, value double"

    def write_chunk(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        part = next((tmp_path / name).glob("part-*.parquet"))
        shutil.copy(part, flat / f"{name}.parquet")

    t0 = base
    # chunk 1: a within-batch tie at t0 — folds 2.0 then 8.0
    write_chunk("c1", [(t0, 1, 8.0), (t0, 1, 2.0)])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q = (
        ewma_stateful(stream, alpha=0.5)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ewma_ties")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # chunk 2: a cross-batch tie at t0 (dropped) + a real advance
    write_chunk("c2", [(t0, 1, 99.0), (t0 + dt.timedelta(seconds=5), 1, 4.0)])
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (r.event_time, r.value, r.ewma)
        for r in spark.sql("select * from ewma_ties").collect()
    )
    # fold: y=2.0, then 0.5*8+0.5*2=5.0; 99.0 dropped; 0.5*4+0.5*5=4.5
    assert got == [
        (t0, 2.0, 2.0),
        (t0, 8.0, 5.0),
        (t0 + dt.timedelta(seconds=5), 4.0, 4.5),
    ]


def test_stateful_misra_gries_guarantees_and_exact_regime(spark, tmp_path):
    """Streaming Misra-Gries (streaming/stateful.misra_gries_stateful)
    across three micro-batches: per-bucket MG guarantees hold against
    bucket traffic (every key with count > n_b/(k+1) present;
    estimates never overcount; undercount bounded), and with
    k >= distinct keys the streamed sketch equals exact counts."""
    import datetime as dt
    from collections import Counter

    from bigdata_commerce_spark.streaming.stateful import misra_gries_stateful

    flat = tmp_path / "flat"
    flat.mkdir()
    base = dt.datetime(2024, 3, 1)
    schema = "event_time timestamp, user_id long, value double"

    def write_chunk(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        part = next((tmp_path / name).glob("part-*.parquet"))
        shutil.copy(part, flat / f"{name}.parquet")

    # heavy hitters 1 and 2, a mid key 3, singleton tail 100..119
    def mk(i, uid):
        return (base + dt.timedelta(seconds=i), uid, 0.0)

    seq = ([1] * 30 + [2] * 20 + [3] * 6 + list(range(100, 120)))
    rows = [mk(i, u) for i, u in enumerate(seq)]
    chunks = [rows[:25], rows[25:50], rows[50:]]

    def run(k, n_buckets, qname):
        import shutil as _sh

        _sh.rmtree(flat, ignore_errors=True)
        flat.mkdir()
        for p in tmp_path.glob("c_*"):
            _sh.rmtree(p, ignore_errors=True)
        write_chunk(f"c_{qname}_1", chunks[0])
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(flat))
        )
        q = (
            misra_gries_stateful(stream, k=k, n_buckets=n_buckets)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
            .start()
        )
        q.processAllAvailable()
        for i, ch in enumerate(chunks[1:], start=2):
            write_chunk(f"c_{qname}_{i}", ch)
            q.processAllAvailable()
        q.stop()
        out = spark.sql(f"select * from {qname}").collect()
        # current generation per bucket = max n_seen
        latest_n = {}
        for r in out:
            latest_n[r.bucket] = max(latest_n.get(r.bucket, 0), r.n_seen)
        return {
            (r.bucket, r.user_id): r.est_count
            for r in out
            if r.n_seen == latest_n[r.bucket]
        }, latest_n

    true = Counter(seq)

    # tight regime: k=3 per bucket, single bucket -> compression fires
    est, latest_n = run(k=3, n_buckets=1, qname="mg_tight")
    n_b = latest_n[list(latest_n)[0]]
    assert n_b == len(seq)
    bound = n_b / (3 + 1)
    for u, c in true.items():
        if c > bound:
            assert (0, u) in est, f"heavy key {u} missing"
    for (b, u), e in est.items():
        assert e <= true[u]
        assert true[u] - e <= bound

    # exact regime: k >= distinct keys, several buckets -> no
    # compression anywhere, estimates ARE the exact counts
    est2, _ = run(k=64, n_buckets=4, qname="mg_exact")
    got_counts = Counter()
    for (b, u), e in est2.items():
        got_counts[u] += e
    assert got_counts == true


def test_max_files_per_trigger_sets_batch_size(spark, tmp_path):
    """The trigger-sizing knob from run_ad_pipeline's guidance
    (SCALE.md trigger-shape table) plumbs through: 6 landed files at
    max_files_per_trigger=3 consume as exactly 2 micro-batches, with
    no rows lost; the soak default (=1) gives one batch per file."""
    import datetime as dt

    flat = tmp_path / "flat"
    flat.mkdir()
    for i in range(6):
        spark.createDataFrame(
            [(dt.datetime(2020, 1, 1, 0, 0, i), dt.date(2020, 1, 1),
              "p1", "c1", 100 + i, 7)],
            ad_stream.AD_EVENT_SCHEMA,
        ).coalesce(1).write.parquet(str(tmp_path / f"stage_{i}"))
        part = next((tmp_path / f"stage_{i}").glob("part-*.parquet"))
        shutil.copy(part, flat / f"{i:02d}.parquet")

    def run(mfpt: int) -> tuple[int, int]:
        batches = []
        q = (
            pipelines.file_event_source(spark, str(flat), max_files_per_trigger=mfpt)
            .writeStream.outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{mfpt}"))
            .foreachBatch(lambda df, _eid: batches.append(df.count()))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return len(batches), sum(batches)

    assert run(3) == (2, 6)
    assert run(1) == (6, 6)


@pytest.mark.perf
def test_trigger_sizing_throughput_ordering(spark, tmp_path):
    """VERDICT r9 item 6: the trigger-sizing guidance in
    run_ad_pipeline's docstring, executed — the four sink merges +
    state reads are a near-fixed per-micro-batch cost, so the SAME 10
    landed files run materially faster as 1 batch of 10 files
    (max_files_per_trigger=10) than as 10 batches of 1
    (max_files_per_trigger=1). Coarse ratio assertion, not a
    benchmark: 10x fewer batches must buy at least 1.5x wall time.
    Marked ``perf`` (ADVICE r10 item 2): a loaded CI host can squeeze
    the absolute walls enough for scheduling jitter to break the 1.5x
    margin, so ordinary `-m "not perf"` tiers skip it; the
    DETERMINISTIC batch-count claim (10 files -> 10 vs 1 micro-batch)
    stays always-on in test_max_files_per_trigger_sets_batch_size."""
    import datetime as dt
    import time

    flat = tmp_path / "flat"
    flat.mkdir()
    for i in range(10):
        spark.createDataFrame(
            [(dt.datetime(2020, 1, 1, 0, 0, i), dt.date(2020, 1, 1),
              "p1", "c1", 100 + i, 7)],
            ad_stream.AD_EVENT_SCHEMA,
        ).coalesce(1).write.parquet(str(tmp_path / f"stage_{i}"))
        part = next((tmp_path / f"stage_{i}").glob("part-*.parquet"))
        shutil.copy(part, flat / f"{i:02d}.parquet")

    def run(mfpt: int) -> float:
        work = tmp_path / f"work_{mfpt}"
        handles = pipelines.run_ad_pipeline(
            pipelines.file_event_source(spark, str(flat), max_files_per_trigger=mfpt),
            str(work),
        )
        t0 = time.monotonic()
        handles.process_all()
        wall = time.monotonic() - t0
        handles.stop()
        # same rows landed either way — the ordering claim is about
        # wall time, not output (which the stream_result twins pin)
        assert sinks.read_state(spark, handles.user_counts_dir).count() == 10
        return wall

    slow = run(1)   # 10 micro-batches
    fast = run(10)  # 1 micro-batch
    assert slow > 1.5 * fast, (
        f"expected >=1.5x speedup from 10x larger trigger, got "
        f"{slow:.1f}s (mfpt=1) vs {fast:.1f}s (mfpt=10)"
    )
