"""Event-time windowed metrics over the change feed — watermark +
tumbling-window aggregation (Structured Streaming's late-data
machinery).

The reference's freshness/lag checks are polling queries
(``verify_streaming/sqls/*_have_latest.sql`` every 10 minutes,
build_verify_streaming_dag.py:81-100). The streaming-native form is an
event-time windowed aggregate with a watermark bounding lateness:
windows close exactly once the watermark passes, so each window's
row is emitted exactly once (append mode) — the per-window event
counts become the engine's ingest-rate/completeness telemetry.

Late events inside the watermark bound are merged into their window
before it closes; events later than the bound are dropped from the
telemetry (they are still APPLIED by the CDC path — LWW-by-seq is
lateness-proof; only the windowed metrics bound lateness)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_feed_metrics(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Per (event-time window, op) telemetry: event count, distinct-doc
    estimate, seq range. Works on a streaming OR batch DataFrame (the
    batch form is the oracle for tests)."""
    # watermarks require zoned TIMESTAMP (session TZ is pinned to UTC
    # in session.py, so the cast is deterministic)
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("win"), "op")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("doc_id").alias("approx_docs"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "op",
            "n_events",
            "approx_docs",
            "min_seq",
            "max_seq",
        )
    )


def run_windowed_metrics_stream(
    spark,
    feed_dir: str,
    checkpoint_dir: str,
    out_table: str = "feed_window_metrics",
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    max_files_per_trigger: int | None = 1,
    out_dir: str | None = None,
):
    """Drive the windowed metrics as a stream over the feed directory
    (append mode — a window row is emitted exactly once, when the
    watermark closes it). Sink: an in-memory table for inspection, or
    a parquet dir (``out_dir``) for durable runs — the parquet sink
    also supports checkpoint RECOVERY (restart emits only windows not
    already emitted; the memory sink does not recover).
    maxFilesPerTrigger=1 makes each feed file its own micro-batch so
    the watermark actually advances between batches."""
    sample = spark.read.option("recursiveFileLookup", "true").parquet(feed_dir)
    reader = spark.readStream.schema(sample.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.option("recursiveFileLookup", "true").parquet(feed_dir)
    writer = (
        windowed_feed_metrics(stream, window, watermark)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if out_dir:
        q = writer.format("parquet").option("path", out_dir).start()
        q.awaitTermination()
        return spark.read.parquet(out_dir)
    q = writer.format("memory").queryName(out_table).start()
    q.awaitTermination()
    return spark.table(out_table)
