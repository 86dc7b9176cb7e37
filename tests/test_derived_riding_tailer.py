"""Derived maintainers riding the ingest loop: ChangeLogTailer's
derived_views hook keeps a NearDupIndex and a SecondaryIndex exactly
one refresh behind main, through churn and replay."""

from __future__ import annotations

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.operators.index import SecondaryIndex
from ethereum_etl_airflow_spark.operators.lsh_index import NearDupIndex
from ethereum_etl_airflow_spark.sources.feed import FeedConfig, write_feed
from ethereum_etl_airflow_spark.streaming.tailer import ChangeLogTailer
from tests.test_cdc_core import assert_state_matches

CFG = FeedConfig(n_docs=120, events_per_batch=300, n_batches=3, dup_tail=30)


def _token_strings(df):
    return F.transform(F.col("tokens"), lambda t: t.cast("string"))


def _lsh_state(idx):
    return {
        (r["b"], r["band_key"], r["ref_doc_id"])
        for r in idx.index.read().select("b", "band_key", "ref_doc_id").collect()
    }


def _lsh_rebuilt(idx):
    docs = idx._live_docs(idx.target.read_raw())
    return {
        (r["b"], r["band_key"], r["ref_doc_id"])
        for r in idx._bands(docs).collect()
    }


def _sec_state(six):
    return {
        (r["value"], r["ref_doc_id"])
        for r in six.index.read().select("value", "ref_doc_id").collect()
    }


def _sec_expected(table):
    return {
        (r["v"], r["d"])
        for r in table.read()
        .select(F.col("source").alias("v"), F.col("doc_id").alias("d"))
        .where(F.col("source").isNotNull())
        .collect()
    }


def test_views_ride_the_replay_loop_and_survive_replay(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, CFG, feed)
    tailer = ChangeLogTailer(
        spark, feed, str(tmp_path / "t"), app_id="dv", num_buckets=8
    )
    idx = NearDupIndex(
        tailer.table, str(tmp_path / "lsh"), tokens_of=_token_strings, num_buckets=8
    )
    six = SecondaryIndex(tailer.table, str(tmp_path / "six"), column="source")
    tailer.derived_views = [idx, six]

    lineages = tailer.replay_batches()
    assert len(lineages) == CFG.n_batches
    # every applied batch refreshed both views and recorded it
    for li in lineages:
        views = {d["view"] for d in li["derived"]}
        assert views == {"NearDupIndex", "SecondaryIndex"}
        assert all(d["info"] is not None for d in li["derived"])

    assert_state_matches(tailer.table, spark, CFG, CFG.n_batches - 1)
    assert _lsh_state(idx) == _lsh_rebuilt(idx)
    assert _sec_state(six) == _sec_expected(tailer.table)

    # full replay from batch 0: every epoch fenced -> zero new applies,
    # views untouched (their cursors already at head)
    before_v = (idx.index.current_version(), six.index.current_version())
    assert tailer.replay_batches() == []
    assert (idx.index.current_version(), six.index.current_version()) == before_v


def test_crash_between_commit_and_refresh_self_heals(spark, tmp_path):
    """Simulate a crash after the table commit but before the view
    refresh: the next batch's refresh diff spans both versions."""
    feed = str(tmp_path / "feed")
    write_feed(spark, CFG, feed)
    tailer = ChangeLogTailer(
        spark, feed, str(tmp_path / "t"), app_id="dv2", num_buckets=8
    )
    idx = NearDupIndex(
        tailer.table, str(tmp_path / "lsh"), tokens_of=_token_strings, num_buckets=8
    )
    # batch 0 applies WITHOUT the view registered = the "crashed before
    # refresh" state
    tailer.replay_batches(end=0)
    assert idx.last_target_version() < tailer.table.current_version()
    # register and continue: the first riding refresh must catch up
    # across BOTH versions
    tailer.derived_views = [idx]
    tailer.replay_batches(start=1)
    assert idx.last_target_version() == tailer.table.current_version()
    assert _lsh_state(idx) == _lsh_rebuilt(idx)


def test_views_ride_the_streaming_loop(spark, tmp_path):
    """The derived_views hook also fires inside run_stream's
    foreachBatch (availableNow drain)."""
    feed = str(tmp_path / "feed")
    write_feed(spark, CFG, feed)
    tailer = ChangeLogTailer(
        spark, feed, str(tmp_path / "t"), app_id="dvs", num_buckets=8
    )
    idx = NearDupIndex(
        tailer.table, str(tmp_path / "lsh"), tokens_of=_token_strings, num_buckets=8
    )
    tailer.derived_views = [idx]
    tailer.run_stream(checkpoint_dir=str(tmp_path / "cp"), available_now=True)
    assert idx.last_target_version() == tailer.table.current_version()
    assert _lsh_state(idx) == _lsh_rebuilt(idx)
    assert any("derived" in li for li in tailer.applied)
