"""applyInPandasWithState tests: running per-source counters must end
at the batch-computed totals, with monotone growth across micro-batch
emissions (state survives batch boundaries)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.sources.feed import FeedConfig, generate_batch, write_feed
from ethereum_etl_airflow_spark.streaming.stateful import run_running_stats_stream

CFG = FeedConfig(n_docs=200, events_per_batch=800, n_batches=3, dup_tail=0)


def test_running_stats_reach_batch_totals(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, CFG, feed)
    emitted = run_running_stats_stream(
        spark, feed, str(tmp_path / "cp"), out_table="rs_t1"
    ).collect()
    assert len(emitted) > 0

    # final running value per source == whole-feed aggregate
    final = {}
    for r in emitted:
        cur = final.get(r.source)
        if cur is None or r.n_events >= cur.n_events:
            final[r.source] = r

    all_ev = generate_batch(spark, CFG, 0)
    for b in range(1, CFG.n_batches):
        all_ev = all_ev.unionByName(generate_batch(spark, CFG, b), allowMissingColumns=True)
    oracle = {
        r.source: r
        for r in all_ev.groupBy(
            F.coalesce(F.col("source"), F.lit("<delete>")).alias("source")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.count_if(F.col("op") == "D").alias("n_deletes"),
            F.max("seq").alias("max_seq"),
        )
        .collect()
    }
    assert set(final) == set(oracle)
    for src, r in final.items():
        w = oracle[src]
        assert (r.n_events, r.n_deletes, r.max_seq) == (w.n_events, w.n_deletes, w.max_seq)

    # state accumulated across batches: some source emitted more than
    # once with strictly growing counts
    multi = [r for r in emitted if r.source != "<delete>"]
    by_src = {}
    for r in multi:
        by_src.setdefault(r.source, []).append(r.n_events)
    assert any(len(v) > 1 and sorted(v) == v and v[0] < v[-1] for v in by_src.values())

def test_rocksdb_state_store_same_results(spark, tmp_path):
    """Production state-store config: the RocksDB provider (bundled
    with Spark) must activate and produce identical final counters —
    the 10^9-key state path with bounded executor memory."""
    from ethereum_etl_airflow_spark.streaming.stateful import use_rocksdb_state_store

    assert use_rocksdb_state_store(spark)  # provider class present in this build
    assert "RocksDB" in spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    try:
        feed = str(tmp_path / "feed")
        write_feed(spark, CFG, feed)
        emitted = run_running_stats_stream(
            spark, feed, str(tmp_path / "cp_rocks"), out_table="rs_rocks"
        ).collect()
        final = {}
        for r in emitted:
            cur = final.get(r.source)
            if cur is None or r.n_events >= cur.n_events:
                final[r.source] = r
        all_ev = generate_batch(spark, CFG, 0)
        for b in range(1, CFG.n_batches):
            all_ev = all_ev.unionByName(generate_batch(spark, CFG, b))
        oracle = {
            r.source_key: r
            for r in all_ev.withColumn(
                "source_key", F.coalesce(F.col("source"), F.lit("<delete>"))
            )
            .groupBy("source_key")
            .agg(
                F.count("*").alias("n_events"),
                F.count_if(F.col("op") == "D").alias("n_deletes"),
                F.max("seq").alias("max_seq"),
            )
            .collect()
        }
        assert set(final) == set(oracle)
        for src, r in final.items():
            w = oracle[src]
            assert (r.n_events, r.n_deletes, r.max_seq) == (
                w.n_events, w.n_deletes, w.max_seq
            )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
