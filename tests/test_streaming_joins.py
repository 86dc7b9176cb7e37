"""Stream-stream interval join + watermark-scoped dedup: the streamed
result must match the batch-computed oracle exactly (ordered feed,
generous watermark — nothing is legitimately late), and the dedup
stream must collapse the feed's at-least-once duplicate tail."""

from __future__ import annotations

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.sources.feed import FeedConfig, generate_batch
from ethereum_etl_airflow_spark.streaming.joins import (
    interval_join,
    run_dedup_stream,
    run_interval_join_stream,
)

CFG = FeedConfig(n_docs=200, events_per_batch=900, n_batches=3, dup_tail=0)
DUP_CFG = FeedConfig(n_docs=200, events_per_batch=900, n_batches=3, dup_tail=150)


def _write_sides(spark, cfg, left_dir: str, right_dir: str) -> None:
    """Left = the change feed; right = a derived 'verdict' stream for a
    subset of docs, landing 60s after the source event. One file per
    batch, written in order (same rationale as test_streaming_windows)."""
    for b in range(cfg.n_batches):
        batch = generate_batch(spark, cfg, b)
        batch.repartition(1).write.mode("overwrite").parquet(
            f"{left_dir}/batch-{b:06d}"
        )
        right = (
            batch.where(F.col("op") != "D")
            .where(F.col("seq") % 3 == 0)
            .select(
                "doc_id",
                (F.col("ts") + F.expr("INTERVAL 60 seconds")).alias("r_ts"),
                (F.xxhash64("doc_id", "seq") % 2 == 0).alias("verdict"),
            )
        )
        right.repartition(1).write.mode("overwrite").parquet(
            f"{right_dir}/batch-{b:06d}"
        )


def test_interval_join_stream_matches_batch(spark, tmp_path):
    left_dir, right_dir = str(tmp_path / "left"), str(tmp_path / "right")
    _write_sides(spark, CFG, left_dir, right_dir)

    streamed = run_interval_join_stream(
        spark,
        left_dir,
        right_dir,
        str(tmp_path / "cp"),
        out_table="ssj_t1",
        upper="5 minutes",
        left_watermark="2 hours",
        right_watermark="2 hours",
    ).collect()
    assert len(streamed) > 0

    left_all = spark.read.option("recursiveFileLookup", "true").parquet(left_dir)
    right_all = spark.read.option("recursiveFileLookup", "true").parquet(right_dir)
    batch = interval_join(left_all, right_all, upper="5 minutes").collect()

    def key(r):
        return (r.doc_id, r.ts, r.r_ts, r.seq, r.verdict)

    assert sorted(map(key, streamed)) == sorted(map(key, batch))


def test_dedup_within_watermark_collapses_duplicate_tail(spark, tmp_path):
    feed = str(tmp_path / "feed")
    for b in range(DUP_CFG.n_batches):
        generate_batch(spark, DUP_CFG, b).repartition(1).write.mode(
            "overwrite"
        ).parquet(f"{feed}/batch-{b:06d}")

    raw = spark.read.option("recursiveFileLookup", "true").parquet(feed)
    n_raw = raw.count()
    n_distinct = raw.dropDuplicates(["doc_id", "seq"]).count()
    assert n_raw > n_distinct, "fixture must contain re-delivered events"

    deduped = run_dedup_stream(
        spark,
        feed,
        str(tmp_path / "cp"),
        keys=["doc_id", "seq"],
        out_table="ssd_t1",
        watermark="2 hours",
    )
    assert deduped.count() == n_distinct
    assert deduped.dropDuplicates(["doc_id", "seq"]).count() == n_distinct
