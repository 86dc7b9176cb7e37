"""Watermark + event-time window tests: emitted (closed) windows must
exactly match the batch-computed aggregation; open windows are
withheld, and a restart emits nothing twice."""

from __future__ import annotations

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.sources.feed import FeedConfig, generate_batch
from ethereum_etl_airflow_spark.streaming.windows import (
    run_windowed_metrics_stream,
    windowed_feed_metrics,
)

CFG = FeedConfig(n_docs=300, events_per_batch=1200, n_batches=3, dup_tail=0)


def _key(r):
    return (r.win_start, r.win_end, r.op)


def write_ordered_feed(spark, cfg, feed):
    """One file per batch, written in order: the file stream then sees
    event time monotonically (a disordered file arrival would be LATE
    data and correctly dropped once beyond the watermark — which is
    what we're testing, so the fixture must be orderly)."""
    for b in range(cfg.n_batches):
        generate_batch(spark, cfg, b).repartition(1).write.mode("overwrite").parquet(
            f"{feed}/batch-{b:06d}"
        )


def test_windowed_metrics_match_batch_oracle(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_ordered_feed(spark, CFG, feed)

    emitted = run_windowed_metrics_stream(
        spark,
        feed,
        str(tmp_path / "cp"),
        out_table="wm_t1",
        window="10 minutes",
        watermark="5 minutes",
    ).collect()
    assert len(emitted) > 0

    # batch oracle over the whole feed
    all_ev = generate_batch(spark, CFG, 0)
    for b in range(1, CFG.n_batches):
        all_ev = all_ev.unionByName(generate_batch(spark, CFG, b), allowMissingColumns=True)
    oracle = {_key(r): r for r in windowed_feed_metrics(all_ev).collect()}

    for r in emitted:
        want = oracle[_key(r)]
        assert (r.n_events, r.min_seq, r.max_seq) == (
            want.n_events,
            want.min_seq,
            want.max_seq,
        ), f"window {_key(r)} mismatch"

    # append mode withholds windows still inside the watermark: the
    # emitted set is a strict subset of all windows (the tail is open)
    assert len(emitted) < len(oracle)


def test_windowed_metrics_restart_emits_nothing_new(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_ordered_feed(spark, CFG, feed)
    out = str(tmp_path / "out")
    first = run_windowed_metrics_stream(
        spark, feed, str(tmp_path / "cp"), out_dir=out
    ).count()
    assert first > 0
    # same checkpoint, no new files: restart emits zero additional rows
    again = run_windowed_metrics_stream(
        spark, feed, str(tmp_path / "cp"), out_dir=out
    ).count()
    assert again == first  # unchanged — nothing re-emitted


def test_late_event_within_watermark_is_merged(spark):
    """Batch-mode sanity on the window assignment itself: events map to
    their event-time window regardless of arrival order."""
    rows = [
        ("I", "a", 1, "2024-01-01 00:01:00"),
        ("I", "b", 2, "2024-01-01 00:12:00"),
        ("U", "a", 3, "2024-01-01 00:03:00"),  # 'late' arrival, same window as seq 1
    ]
    df = spark.createDataFrame(rows, "op string, doc_id string, seq long, ts_s string").select(
        "op", "doc_id", "seq", F.col("ts_s").cast("timestamp_ntz").alias("ts")
    )
    out = {(_r.win_start.minute, _r.op): _r.n_events for _r in windowed_feed_metrics(df).collect()}
    assert out[(0, "I")] == 1 and out[(0, "U")] == 1 and out[(10, "I")] == 1