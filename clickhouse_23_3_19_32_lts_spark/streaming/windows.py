"""WINDOW VIEW semantics on Structured Streaming.

Mapping (SURVEY.md §2.9):
  - tumble(ts, INTERVAL x)       → F.window(ts, x)            (same bucketing)
  - hop(ts, slide, size)         → F.window(ts, size, slide)
  - WATERMARK ... DELAY d        → df.withWatermark(ts, d)    (bounded-ascending
    watermark, StorageWindowView.h:72-89; drop-late semantics identical)
  - ALLOWED_LATENESS updates     → outputMode("update")
  - session windows              → F.session_window (absent in the reference's
    WindowView, StorageWindowView.cpp:107-110 — a strict superset here)
  - MATERIALIZED VIEW            → writeStream into parquet dir + checkpoint
    (exactly-once per micro-batch ≥ the reference's at-least-once Kafka MV)

Scale notes: windowed aggregation state is partitioned by (window, keys) in
the state store; watermark bounds state size — the same eviction rule the
reference applies when firing windows. The batch queries in queries.py reuse
the identical F.window expression, so batch results == final streaming
results for the same input (tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def tumble(ts: Column | str, size: str) -> Column:
    """tumble(ts, INTERVAL size) — non-overlapping buckets."""
    return F.window(ts, size)


def hop(ts: Column | str, slide: str, size: str) -> Column:
    """hop(ts, slide, size) — overlapping buckets every `slide`.

    Note the reference's argument order (slide first: FunctionsTimeWindow
    tumble/hop registration) vs Spark's window(ts, size, slide).
    """
    return F.window(ts, size, slide)


def _windowed(
    stream: DataFrame,
    ts_col: str,
    window_col: Column,
    aggs: list[Column],
    keys: list[str] | None,
    watermark_delay: str | None,
) -> DataFrame:
    if watermark_delay is not None:
        stream = stream.withWatermark(ts_col, watermark_delay)
    keys = keys or []
    out = stream.groupBy(window_col.alias("w"), *(F.col(k) for k in keys)).agg(*aggs)
    agg_names = [c for c in out.columns if c != "w" and c not in keys]
    return out.select(
        F.col("w.start").alias("wstart"),
        F.col("w.end").alias("wend"),
        *(F.col(k) for k in keys),
        *(F.col(c) for c in agg_names),
    )


def tumble_window_view(
    stream: DataFrame,
    ts_col: str,
    size: str,
    aggs: list[Column],
    keys: list[str] | None = None,
    watermark_delay: str | None = "0 seconds",
) -> DataFrame:
    """WINDOW VIEW ... GROUP BY tumble(ts, size): fires when the watermark
    passes window end (append mode); late rows beyond the delay are dropped —
    StorageWindowView fire_task semantics."""
    return _windowed(stream, ts_col, tumble(ts_col, size), aggs, keys, watermark_delay)


def hop_window_view(
    stream: DataFrame,
    ts_col: str,
    slide: str,
    size: str,
    aggs: list[Column],
    keys: list[str] | None = None,
    watermark_delay: str | None = "0 seconds",
) -> DataFrame:
    """WINDOW VIEW over hop(ts, slide, size) — each row lands in
    size/slide overlapping windows."""
    return _windowed(stream, ts_col, hop(ts_col, slide, size), aggs, keys, watermark_delay)


def session_window_view(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    aggs: list[Column],
    keys: list[str] | None = None,
    watermark_delay: str | None = "0 seconds",
) -> DataFrame:
    """Session windows (gap-based). The reference's WindowView lacks these;
    sessionization there requires windowFunnel-style aggregates (§2.4)."""
    return _windowed(
        stream, ts_col, F.session_window(ts_col, gap), aggs, keys, watermark_delay
    )


def materialized_view(
    transformed: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    trigger_available_now: bool = True,
):
    """CREATE MATERIALIZED VIEW ... TO target: continuous transform written
    to a parquet target with checkpointed exactly-once micro-batches
    (StorageMaterializedView.cpp ≈ per-INSERT-block push, but transactional).

    Returns the started StreamingQuery; caller awaits/stops it.
    """
    writer = (
        transformed.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """StorageKafka consume (KafkaSource.cpp) → readStream.format('kafka').

    Returns raw (key, value, topic, partition, offset, timestamp) — apply a
    format decoder (from_json/from_csv) downstream, like the reference's
    format-parsing consumers. Requires the spark-sql-kafka package on the
    cluster; not available in this container, so untested here by design.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def replay_source(
    spark: SparkSession,
    directory: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Deterministic replay source for tests/backfills: stream parquet files
    from a directory one micro-batch per file — the test harness stand-in
    for Kafka (same downstream operators, same watermark semantics)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(directory)
    )
