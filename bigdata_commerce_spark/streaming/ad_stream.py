"""Real-time ad-click analytics on Structured Streaming (reqs 7-10).

The reference runs these on 5-second DStream micro-batches over Kafka
(``adversStat/src/main/scala/AdverStat.scala``) with MySQL point
reads/writes scattered across driver and executors. Here the whole
topology is declarative:

    source -> parse -> stream-static anti-join (blacklist)
           -> four sinks (blacklist gen / cumulative / top-3 / trend)

Semantic upgrades over the reference (SURVEY.md §2.9): event-time
windows with watermarks instead of processing-time
``reduceByKeyAndWindow``; retry-safe idempotent epoch sinks instead of
read-modify-write JDBC; no driver-side DB reads per batch.

Sources are pluggable: Kafka in production
(``spark.readStream.format('kafka')`` — same parse function), file /
rate sources in tests (Kafka brokers aren't available here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference wire format: space-delimited text lines
# "timestamp province city userid adid" (``MockRealTimeData.scala:29-39``).
AD_LOG_FIELDS = ("ts_ms", "province", "city", "user_id", "ad_id")

AD_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_time", T.TimestampType(), True),
        T.StructField("event_date", T.DateType(), True),
        T.StructField("province", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("ad_id", T.LongType(), True),
    ]
)


def parse_ad_log(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse the reference's positional text lines into typed columns
    (replaces ``AdverStat.scala:97-103``'s split-at-every-use; fixes
    SURVEY.md §2.12/6 — epoch millis parsed as a number, not
    ``new Date(String)``). Positions come from AD_LOG_FIELDS so a
    wire-format change edits ONE constant, not hardcoded indices.

    Total over garbage wire data: fields come out of the split via
    get() (NULL past the end — getItem ANSI-aborts on a SHORT line)
    and numerics via try_cast, never cast (a plain cast ANSI-aborts
    on a non-numeric token). Either abort is fatal for a stream in a
    way it isn't for batch: the restarted query re-reads the SAME
    poisoned offset and dies again, wedging the pipeline permanently.
    Garbage parses to NULL fields (NULL event_time/keys), which
    downstream groupings keep as an observable 'unattributed'
    bucket."""
    parts = F.split(F.col(value_col).cast("string"), " ")
    pos = {name: F.get(parts, i) for i, name in enumerate(AD_LOG_FIELDS)}
    ts = F.timestamp_millis(pos["ts_ms"].try_cast("bigint"))
    return lines.select(
        ts.alias("event_time"),
        F.to_date(ts).alias("event_date"),
        pos["province"].alias("province"),
        pos["city"].alias("city"),
        pos["user_id"].try_cast("bigint").alias("user_id"),
        pos["ad_id"].try_cast("bigint").alias("ad_id"),
    )


def without_blacklisted(stream: DataFrame, blacklist: DataFrame) -> DataFrame:
    """Stream-static left-anti join: the static side is re-resolved
    every micro-batch by Structured Streaming, which is exactly the
    reference's per-batch blacklist re-read (``AdverStat.scala:54-69``)
    without the driver-side DB round trip."""
    return stream.join(blacklist.select("user_id"), "user_id", "left_anti")


def cumulative_counts(stream: DataFrame) -> DataFrame:
    """Req 8: running totals per (date, province, city, ad) —
    ``updateStateByKey`` (``AdverStat.scala:211-223``) becomes a
    stateful aggregation in update mode.

    State honesty: the grouping keys carry NO event-time column, so
    the watermark mechanism cannot evict this state (Spark only
    applies the watermark predicate to event-time grouping keys) —
    running totals inherently keep one state row per key forever.
    State is bounded by KEY CARDINALITY, not time: past dates stop
    receiving updates but their rows remain until retired out-of-band.
    That is exactly why the production topology (pipelines.py) keeps
    these totals in SINK-side state (foreachBatch additive merge)
    rather than the streaming state store — the sink table can be
    partitioned and pruned by date. An earlier form took a watermark
    parameter and claimed it bounded state; that claim was wrong and
    the parameter is gone."""
    return stream.groupBy("event_date", "province", "city", "ad_id").agg(
        F.count(F.lit(1)).alias("click_count")
    )


def minute_window_trend(
    stream: DataFrame,
    window_minutes: int = 60,
    slide_minutes: int = 1,
    watermark: str = "5 minutes",
) -> DataFrame:
    """Req 10: sliding event-time window counts with a watermark —
    the reference's ``reduceByKeyAndWindow(Minutes(60), Minutes(1))``
    evaluated in *processing* time with no late-data policy
    (``AdverStat.scala:93-109``); event time + watermark is the
    documented semantic upgrade."""
    return (
        stream.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", f"{window_minutes} minutes", f"{slide_minutes} minutes"),
            "ad_id",
        )
        .agg(F.count(F.lit(1)).alias("click_count"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "ad_id",
            "click_count",
        )
    )


def blacklist_from_counts(counts: DataFrame, threshold: int = 100) -> DataFrame:
    """Req 7 head: users over the per-(date, ad) threshold. Applied to
    the state table inside foreachBatch (see pipelines.py), mirroring
    ``AdverStat.scala:287-309`` without per-key DB lookups."""
    return counts.where(F.col("click_count") > threshold).select("user_id").distinct()


def province_top3_from_counts(counts: DataFrame) -> DataFrame:
    """Req 9 head: top-3 ads per (date, province) from the cumulative
    state (the reference recomputes it per batch from its state stream
    — ``AdverStat.scala:134-191``)."""
    from bigdata_commerce_spark.operators.topk import top_k_per_group

    per_province = counts.groupBy("event_date", "province", "ad_id").agg(
        F.sum("click_count").alias("click_count")
    )
    return top_k_per_group(
        per_province,
        ["event_date", "province"],
        [F.desc("click_count"), F.asc("ad_id")],
        k=3,
    )


def session_window_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Optional extension (SURVEY.md §2.9 'session windows: absent'):
    event-time session windows with a gap timeout — the streaming twin
    of the batch gap-sessionization in operators/sessionize.py. The
    reference can't express this at all (its sessions are pre-assigned
    ids in mock data)."""
    return (
        stream.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
