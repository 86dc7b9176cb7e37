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


class TestEnrichStreamStatic:
    """Stream-static enrichment re-reads the dim's CURRENT snapshot per
    micro-batch: dim updates between triggers reach the next batch."""

    def test_dim_updates_visible_to_later_batches(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from ethereum_etl_airflow_spark.operators.cdc import apply_changes
        from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable
        from ethereum_etl_airflow_spark.streaming.joins import run_enrich_stream

        schema = (
            "op string, doc_id string, seq long, tokens array<int>, "
            "n_tok int, source string"
        )

        def mk(rows):
            return spark.createDataFrame(rows, schema).withColumn(
                "ts", F.timestamp_seconds(F.col("seq")).cast("timestamp_ntz")
            )

        # dimension: doc metadata keyed by doc_id (tier rides in source)
        dim = SnapshotTable(spark, str(tmp_path / "dim"), num_buckets=2)
        apply_changes(dim, mk([("I", "a", 1, [1], 1, "gold")]), "dim", epoch=0)

        # two feed batches as separate files; 1 file per trigger
        feed = str(tmp_path / "feed")
        mk([("I", "a", 10, [1, 2], 2, "s")]).write.parquet(f"{feed}/batch-0")

        out1 = run_enrich_stream(
            spark,
            feed,
            dim,
            checkpoint_dir=str(tmp_path / "cp"),
            out_dir=str(tmp_path / "out"),
            dim_columns=["source"],
        )
        rows1 = {
            (r.doc_id, r.seq): r.asDict() for r in out1.collect()
        }
        assert rows1[("a", 10)]["dim_source"] == "gold"  # dim v0 value

        # dim update lands BETWEEN triggers; second batch arrives
        apply_changes(dim, mk([("U", "a", 2, [1], 1, "silver")]), "dim", epoch=1)
        mk([("U", "a", 11, [1, 2, 3], 3, "s")]).write.parquet(f"{feed}/batch-1")

        out2 = run_enrich_stream(
            spark,
            feed,
            dim,
            checkpoint_dir=str(tmp_path / "cp"),  # same checkpoint: resume
            out_dir=str(tmp_path / "out"),
            dim_columns=["source"],
        )
        rows2 = {(r.doc_id, r.seq): r.asDict() for r in out2.collect()}
        # batch 0's enrichment is untouched; batch 1 sees the new dim
        assert rows2[("a", 10)]["dim_source"] == "gold"
        assert rows2[("a", 11)]["dim_source"] == "silver"
