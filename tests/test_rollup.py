"""Incremental rollup tests: snapshot-diff maintenance must equal a
from-scratch groupBy at every step, survive deletes/updates, fence
replays, and support time travel."""

from __future__ import annotations

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.operators.rollup import IncrementalRollup
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable
from ethereum_etl_airflow_spark.sources.feed import FeedConfig, generate_batch


def scratch_stats(table):
    return {
        r.doc_id: (r.n_docs, r.n_toks)
        for r in table.read()
        .groupBy(F.coalesce("source", F.lit("<null>")).alias("doc_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tok").cast("long")).alias("n_toks"),
        )
        .collect()
    }


def rollup_stats(rollup):
    return {r.doc_id: (r.n_docs, r.n_toks) for r in rollup.read_stats().collect()}


def test_rollup_tracks_scratch_aggregate_per_batch(spark, tmp_path):
    cfg = FeedConfig(n_docs=300, events_per_batch=600, n_batches=4, dup_tail=100)
    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=8, compact_files=3)
    rollup = IncrementalRollup(table, str(tmp_path / "stats"))
    for b in range(cfg.n_batches):
        apply_changes(table, generate_batch(spark, cfg, b), "r1", epoch=b)
        info = rollup.refresh()
        assert info is not None
        assert rollup_stats(rollup) == scratch_stats(table)  # exact per step


def test_rollup_multi_batch_catchup_and_fence(spark, tmp_path):
    cfg = FeedConfig(n_docs=200, events_per_batch=400, n_batches=3, dup_tail=50)
    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=8)
    rollup = IncrementalRollup(table, str(tmp_path / "stats"))
    for b in range(cfg.n_batches):
        apply_changes(table, generate_batch(spark, cfg, b), "r2", epoch=b)
    # one refresh catches up across all three target versions
    info = rollup.refresh()
    assert info["from_version"] == -1 and info["to_version"] == table.current_version()
    assert rollup_stats(rollup) == scratch_stats(table)
    # fenced: nothing new -> no-op
    assert rollup.refresh() is None


def test_rollup_handles_deletes_and_updates(spark, tmp_path):
    def mk(rows):
        return spark.createDataFrame(
            rows, "op string, doc_id string, seq long, tokens array<int>, n_tok int, source string"
        ).withColumn("ts", F.timestamp_seconds(F.col("seq")).cast("timestamp_ntz"))

    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    rollup = IncrementalRollup(table, str(tmp_path / "stats"))
    apply_changes(table, mk([("I", "a", 1, [1, 2], 2, "web"), ("I", "b", 2, [3], 1, "code")]), "r3", 0)
    rollup.refresh()
    assert rollup_stats(rollup) == {"web": (1, 2), "code": (1, 1)}
    # update moves a doc between groups and changes its token count
    apply_changes(table, mk([("U", "a", 3, [9, 9, 9], 3, "code")]), "r3", 1)
    rollup.refresh()
    assert rollup_stats(rollup) == {"code": (2, 4)} | {}  # web dropped to zero
    # delete retracts
    apply_changes(table, mk([("D", "b", 4, None, None, None)]), "r3", 2)
    rollup.refresh()
    assert rollup_stats(rollup) == {"code": (1, 3)}


def test_snapshot_time_travel(spark, tmp_path):
    def mk(rows):
        return spark.createDataFrame(
            rows, "op string, doc_id string, seq long, tokens array<int>, n_tok int, source string"
        ).withColumn("ts", F.timestamp_seconds(F.col("seq")).cast("timestamp_ntz"))

    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    apply_changes(table, mk([("I", "a", 1, [1], 1, "web")]), "tt", 0)
    v0 = table.current_version()
    apply_changes(table, mk([("U", "a", 2, [1, 2], 2, "web"), ("I", "b", 3, [5], 1, "web")]), "tt", 1)
    # current state
    cur = {r.doc_id: tuple(r.tokens) for r in table.read().collect()}
    assert cur == {"a": (1, 2), "b": (5,)}
    # as-of v0
    old = {r.doc_id: tuple(r.tokens) for r in table.read(version=v0).collect()}
    assert old == {"a": (1,)}