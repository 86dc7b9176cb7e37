"""End-to-end exactly-once chain (the north-star pipeline in one test):

    ordered change feed -> ChangeLogTailer -> base SnapshotTable
        -> CDF (full changelog) -> IncrementalAggView (per-source
           token totals)

Every hop is epoch/version-fenced; the test crashes BOTH consumers
mid-stream (fresh instances over the same storage) and proves the
final materialized aggregate equals a from-first-principles recompute
of the feed's LWW state — nothing double-counted, nothing lost."""

from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.operators.incr_agg import IncrementalAggView
from ethereum_etl_airflow_spark.sources.feed import FeedConfig, write_feed
from ethereum_etl_airflow_spark.streaming.tailer import ChangeLogTailer

CFG = FeedConfig(n_docs=300, events_per_batch=800, n_batches=4, dup_tail=100)


def _mk_view(spark, base, root):
    return IncrementalAggView(
        spark, base, root, key_col="source", val_col="n_tok", num_buckets=4
    )


def _expected(spark, feed_dir):
    """First-principles fold of the WHOLE feed, then the aggregate."""
    ev = spark.read.parquet(f"{feed_dir}/batch-*")
    w_latest = F.expr("max_by(struct(op, n_tok, source), seq)")
    state = ev.groupBy("doc_id").agg(w_latest.alias("s")).where(F.col("s.op") != "D")
    return {
        r["doc_id"]: (float(r["sum_val"]), r["cnt"])
        for r in state.groupBy(F.col("s.source").alias("doc_id"))
        .agg(
            F.sum(F.col("s.n_tok").cast("decimal(38,6)")).alias("sum_val"),
            F.count("*").alias("cnt"),
        )
        .collect()
    }


def test_feed_to_aggregate_chain_exactly_once_under_crash(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, CFG, feed)

    base_root = str(tmp_path / "base")
    view_root = str(tmp_path / "view")

    # ---- phase 1: ingest half the feed, fold into the view
    t1 = ChangeLogTailer(spark, feed, base_root, app_id="chain")
    t1.replay_batches(end=1)
    v1 = _mk_view(spark, t1.table, view_root)
    v1.run_until_caught_up()
    mid_cursor = v1.cursor()
    assert mid_cursor >= 0

    # ---- simulated crash: BOTH consumers restart from storage alone
    t2 = ChangeLogTailer(spark, feed, base_root, app_id="chain")
    # at-least-once feed: replay from 0 — epochs 0,1 are fenced
    applied = t2.replay_batches()
    assert [li["epoch"] for li in applied] == [2, 3]
    v2 = _mk_view(spark, t2.table, view_root)
    assert v2.cursor() == mid_cursor  # resumed, not reset
    v2.run_until_caught_up()
    # replaying the view's poll again is a no-op (fenced)
    assert v2.process_once() is None

    got = {
        r["doc_id"]: (float(r["sum_val"]), r["cnt"]) for r in v2.read().collect()
    }
    assert got == _expected(spark, feed)
    # and the view still equals its own from-scratch recompute
    rec = {
        r["doc_id"]: (float(r["sum_val"]), r["cnt"])
        for r in v2.recompute().collect()
    }
    assert got == rec
