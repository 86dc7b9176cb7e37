"""Stream-stream joins and watermark-scoped streaming dedup.

Completes the §2.10 streaming surface: the reference's verify DAGs
cross-check two *tables* after load (e.g. transactions vs receipts
counts, ``dags/resources/stages/verify``); the streaming-native form
is joining the two CHANGE FEEDS while both are in flight. Structured
Streaming's stream-stream join keeps each side buffered in state until
the watermark proves no more matches can arrive, so the join condition
must bound event time on BOTH sides (an equi-key alone would grow
state forever).

Scale notes (100 TB / unbounded):
* State size = events inside the watermark horizon per side, sharded
  by join key across executors — horizon x input rate is the budget,
  so the watermark is the ONLY state-cap knob; both helpers take it
  explicitly and default tight.
* The interval condition (``r_ts`` in ``[ts, ts + upper]``) lets the
  engine expire left rows at ``watermark - upper`` and right rows at
  ``watermark`` — without the bound the state store never evicts.
* ``dropDuplicatesWithinWatermark`` is the at-least-once feed's
  exactly-once gate when the *producer* retries with jittered
  timestamps: state is one key per event inside the horizon (compare
  the unbounded plain ``dropDuplicates`` on a stream, which is a
  memory leak by construction). The CDC apply path itself stays
  LWW-by-(seq,epoch) — lateness-proof regardless (operators/cdc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "doc_id",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    upper: str = "5 minutes",
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
) -> DataFrame:
    """Inner join of two (streaming or batch) frames on ``key`` where
    the right event lands inside ``[left.ts, left.ts + upper]``.

    Works identically on batch frames (no watermark applied) — the
    batch form is the test oracle, mirroring windowed_feed_metrics'
    batch/stream duality."""
    lf = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    rf = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
    if lf.isStreaming:
        lf = lf.withWatermark(left_ts, left_watermark)
    if rf.isStreaming:
        rf = rf.withWatermark(right_ts, right_watermark)
    cond = (
        (lf[key] == rf[key])
        & (rf[right_ts] >= lf[left_ts])
        & (rf[right_ts] <= lf[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return lf.join(rf, cond, "inner").select(
        lf[key].alias(key),
        lf[left_ts].alias(left_ts),
        rf[right_ts].alias(right_ts),
        *[lf[c] for c in left.columns if c not in (key, left_ts)],
        *[rf[c] for c in right.columns if c not in (key, right_ts)],
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Exactly-once gate over an at-least-once feed: drop re-deliveries
    of the same ``keys`` arriving within the watermark horizon. State
    holds one entry per distinct key inside the horizon and is evicted
    as the watermark advances. Batch frames fall back to plain
    ``dropDuplicates`` (the oracle semantics)."""
    s = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if not s.isStreaming:
        return s.dropDuplicates(keys)
    return s.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def _file_stream(spark, feed_dir: str, max_files: int | None = 1):
    sample = spark.read.option("recursiveFileLookup", "true").parquet(feed_dir)
    reader = spark.readStream.schema(sample.schema)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", str(max_files))
    return reader.option("recursiveFileLookup", "true").parquet(feed_dir)


def run_interval_join_stream(
    spark,
    left_dir: str,
    right_dir: str,
    checkpoint_dir: str,
    out_table: str = "joined_stream",
    **join_kw,
) -> DataFrame:
    """Drive interval_join over two file-stream directories (append
    mode, availableNow): each joined row is emitted exactly once, when
    the watermark proves its match set complete."""
    joined = interval_join(
        _file_stream(spark, left_dir), _file_stream(spark, right_dir), **join_kw
    )
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("memory")
        .queryName(out_table)
        .start()
    )
    q.awaitTermination()
    return spark.table(out_table)


def run_dedup_stream(
    spark,
    feed_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    out_table: str = "deduped_stream",
    **dedup_kw,
) -> DataFrame:
    """Drive dedup_within_watermark over a file-stream feed (append
    mode, availableNow)."""
    deduped = dedup_within_watermark(_file_stream(spark, feed_dir), keys, **dedup_kw)
    q = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("memory")
        .queryName(out_table)
        .start()
    )
    q.awaitTermination()
    return spark.table(out_table)


def run_enrich_stream(
    spark,
    feed_dir: str,
    dim_table,
    checkpoint_dir: str,
    out_dir: str,
    key: str = "doc_id",
    dim_columns: list[str] | None = None,
    broadcast_dim: bool = True,
    max_files: int | None = 1,
) -> DataFrame:
    """Stream-static enrichment: join the change stream against a
    snapshot-table dimension, re-reading the dimension's CURRENT
    snapshot at every micro-batch — dim updates committed between
    triggers are visible to the next batch (the Iceberg/Delta
    stream-static refresh semantics, which a plain parquet static side
    cannot give: its file list freezes at plan time). This is the
    slowly-changing-dimension enrichment the reference's enrich stage
    performs table-at-a-time, in streaming form.

    Scale notes: the per-batch dim read uses column projection
    (``dim_columns``) so only the join payload leaves the dim's
    parquet; ``broadcast_dim`` fits the common small-dim case (no
    stream shuffle at all — stateless enrichment, unlike stream-stream
    joins there is NO watermark state to budget). For a dim too big to
    broadcast, pass False and pre-bucket both sides on the key.
    foreachBatch output is appended per epoch; Spark's checkpoint
    makes replays re-run the same epoch, and the parquet append is
    made idempotent by writing each epoch to its own subdirectory
    (re-processing overwrites the same epoch dir, never duplicates)."""
    stream = _file_stream(spark, feed_dir, max_files)

    def _apply(batch_df, epoch_id: int):
        dim = dim_table.read(columns=dim_columns)  # FRESH snapshot
        # dim payload gets a dim_ prefix: stream and dimension schemas
        # routinely share names (source, ts, ...) and a silent clash is
        # an AnalysisException at best, wrong attribution at worst
        dim = dim.select(
            key, *[F.col(c).alias(f"dim_{c}") for c in dim.columns if c != key]
        )
        if broadcast_dim:
            dim = F.broadcast(dim)
        enriched = batch_df.join(dim, key, "left")
        # per-epoch overwrite = idempotent under checkpoint replay
        enriched.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)
