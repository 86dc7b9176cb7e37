"""Live follow-mode test: the tailer runs with a processing-time
trigger while NEW feed batches land mid-flight — they must be picked
up (the file source as sensor, S6), applied exactly-once, and the
final state must equal the full oracle fold."""

from __future__ import annotations

import time

from ethereum_etl_airflow_spark.sources.feed import FeedConfig, write_feed
from ethereum_etl_airflow_spark.streaming.tailer import ChangeLogTailer
from tests.test_cdc_core import assert_state_matches

CFG = FeedConfig(n_docs=200, events_per_batch=500, n_batches=4, dup_tail=50)


def test_follow_mode_picks_up_new_batches(spark, tmp_path):
    feed = str(tmp_path / "feed")
    # only the first two batches exist at stream start
    write_feed(spark, CFG, feed, batches=range(0, 2))
    tailer = ChangeLogTailer(spark, feed, str(tmp_path / "t"), app_id="fm", num_buckets=8)
    q = tailer.run_stream(
        checkpoint_dir=str(tmp_path / "cp"),
        available_now=False,  # continuous micro-batches
    )
    try:
        deadline = time.time() + 120
        while tailer.table.last_epoch("fm:stream") < 0 and time.time() < deadline:
            time.sleep(1)
        # land the remaining batches while the stream is live
        write_feed(spark, CFG, feed, batches=range(2, CFG.n_batches))
        while time.time() < deadline:
            applied_events = sum(li["events_in"] for li in tailer.applied)
            if applied_events >= CFG.events_per_batch * CFG.n_batches:
                break
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination()
    assert_state_matches(tailer.table, spark, CFG, CFG.n_batches - 1)

def test_rate_limit_splits_backlog_into_micro_batches(spark, tmp_path):
    """Backpressure: with maxFilesPerTrigger=1 an availableNow drain of
    a 4-batch backlog must admit it over multiple fenced micro-batches
    (never one giant bite), and still converge to the oracle state."""
    feed = str(tmp_path / "feed")
    write_feed(spark, CFG, feed)
    tailer = ChangeLogTailer(spark, feed, str(tmp_path / "t"), app_id="rl", num_buckets=8)
    tailer.run_stream(
        checkpoint_dir=str(tmp_path / "cp"),
        available_now=True,
        max_files_per_trigger=1,
    )
    assert len(tailer.applied) > 1  # backlog split, not swallowed whole
    assert_state_matches(tailer.table, spark, CFG, CFG.n_batches - 1)
