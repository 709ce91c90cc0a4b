"""Wired streaming pipelines: source -> transforms -> epoch sinks.

``run_ad_pipeline`` is the full topology of reference reqs 7-10 over
any streaming DataFrame of parsed ad events. Tests drive it with a
file source (maxFilesPerTrigger=1 -> one micro-batch per file);
production points the same function at a Kafka source.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_commerce_spark.streaming import ad_stream, sinks


@dataclass
class AdPipelineHandles:
    """Running queries + state locations (read with sinks.read_state)."""

    queries: list
    user_counts_dir: str
    blacklist_dir: str
    cumulative_dir: str
    top3_dir: str
    trend_dir: str

    def stop(self) -> None:
        for q in self.queries:
            q.stop()

    def process_all(self) -> None:
        for q in self.queries:
            q.processAllAvailable()


def run_ad_pipeline(
    events: DataFrame,
    work_dir: str,
    blacklist_threshold: int = 100,
    watermark: str = "10 minutes",
) -> AdPipelineHandles:
    """Start the four streaming queries of reqs 7-10.

    ``events`` must match AD_EVENT_SCHEMA (use parse_ad_log for raw
    text lines). Each query checkpoints independently under work_dir.
    """
    spark = events.sparkSession
    dirs = {
        name: os.path.join(work_dir, name)
        for name in ("user_counts", "blacklist", "cumulative", "top3", "trend", "ckpt")
    }

    # Req 7: per-batch (date, user, ad) counts -> *additive* state
    # merge (AdUserClickCount semantics: the reference reduceByKey's
    # each batch then accumulates in MySQL) -> threshold -> distinct
    # blacklist, derived inside the same batch fn so blacklist epochs
    # align with count epochs. Note: an update-mode stateful agg would
    # emit running totals — pairing *that* with an additive sink would
    # double-count; additive merges take raw per-batch counts.
    user_counts_sink = sinks.accumulate_sink(
        dirs["user_counts"], ["event_date", "user_id", "ad_id"], "click_count"
    )
    blacklist_sink = sinks.distinct_append_sink(dirs["blacklist"], ["user_id"])

    def user_counts_batch(batch_df: DataFrame, epoch_id: int) -> None:
        per_batch = batch_df.groupBy("event_date", "user_id", "ad_id").agg(
            F.count(F.lit(1)).alias("click_count")
        )
        user_counts_sink(per_batch, epoch_id)
        state = sinks.read_state(batch_df.sparkSession, dirs["user_counts"])
        over = ad_stream.blacklist_from_counts(state, blacklist_threshold)
        blacklist_sink(over, epoch_id)

    q_counts = (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(dirs["ckpt"], "counts"))
        .foreachBatch(user_counts_batch)
        .start()
    )

    # Req 8: cumulative (date, province, city, ad) totals. Update-mode
    # stateful agg emits changed keys; overwrite-by-key merge keeps the
    # state table at the latest totals. Req 9 derives from that state.
    cumulative_sink = sinks.overwrite_sink(
        dirs["cumulative"], ["event_date", "province", "city", "ad_id"]
    )
    top3_sink = sinks.replace_partition_sink(dirs["top3"], ["event_date", "province"])

    def cumulative_batch(batch_df: DataFrame, epoch_id: int) -> None:
        cumulative_sink(batch_df, epoch_id)
        state = sinks.read_state(batch_df.sparkSession, dirs["cumulative"])
        top3_sink(ad_stream.province_top3_from_counts(state), epoch_id)

    q_cumulative = (
        ad_stream.cumulative_counts(events, watermark)
        .writeStream.outputMode("update")
        .option("checkpointLocation", os.path.join(dirs["ckpt"], "cumulative"))
        .foreachBatch(cumulative_batch)
        .start()
    )

    # Req 10: sliding window trend (update mode, overwrite-by-window).
    trend_sink = sinks.overwrite_sink(
        dirs["trend"], ["window_start", "window_end", "ad_id"]
    )
    q_trend = (
        ad_stream.minute_window_trend(events, watermark=watermark)
        .writeStream.outputMode("update")
        .option("checkpointLocation", os.path.join(dirs["ckpt"], "trend"))
        .foreachBatch(trend_sink)
        .start()
    )

    return AdPipelineHandles(
        queries=[q_counts, q_cumulative, q_trend],
        user_counts_dir=dirs["user_counts"],
        blacklist_dir=dirs["blacklist"],
        cumulative_dir=dirs["cumulative"],
        top3_dir=dirs["top3"],
        trend_dir=dirs["trend"],
    )


def file_event_source(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Test/file source producing AD_EVENT_SCHEMA batches — one
    micro-batch per file, mimicking the 5s Kafka cadence."""
    return (
        spark.readStream.schema(ad_stream.AD_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
