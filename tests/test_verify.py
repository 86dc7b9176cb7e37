"""Verify-stage tests: single-pass check evaluation, each reference
invariant (gap-free, uniqueness, token invariant, freshness, dense
sequence, count reconciliation), and tailer integration."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.sources.feed import FeedConfig, write_feed
from ethereum_etl_airflow_spark.streaming.tailer import ChangeLogTailer
from ethereum_etl_airflow_spark.verify import (
    VerificationError,
    counts_reconcile,
    dense_per_group,
    freshness,
    gap_free,
    run_checks,
    tokens_invariant,
    unique_key,
)

SF = "/root/testdata/sf0.001"


def test_gap_free_pass_and_fail(spark):
    df = spark.range(10, 20)
    assert "PASS" in run_checks(df, [gap_free("id")])["gap_free_id"]
    holes = df.where(F.col("id") != 15)
    with pytest.raises(VerificationError, match="gap_free_id"):
        run_checks(holes, [gap_free("id")])
    # tolerance absorbs the hole (the reference's ±2 band)
    assert "PASS" in run_checks(holes, [gap_free("id", tolerance=1)])["gap_free_id"]


def test_unique_key_and_tokens_invariant(spark):
    ok = spark.createDataFrame(
        [("a", [1, 2], 2), ("b", [3], 1)], "doc_id string, tokens array<int>, n_tok int"
    )
    res = run_checks(ok, [unique_key("doc_id"), tokens_invariant()])
    assert all("PASS" in v for v in res.values())
    bad = spark.createDataFrame(
        [("a", [1, 2], 9), ("a", [3], 1)], "doc_id string, tokens array<int>, n_tok int"
    )
    res = run_checks(bad, [unique_key("doc_id"), tokens_invariant()], strict=False)
    assert all("FAIL" in v for v in res.values())


def test_single_job_multi_check(spark):
    """All scalar checks fold into ONE aggregation (one collect)."""
    df = spark.range(0, 100).select(
        F.col("id"),
        F.col("id").cast("string").alias("doc_id"),
        F.array(F.lit(1)).alias("tokens"),
        F.lit(1).alias("n_tok"),
    )
    res = run_checks(df, [gap_free("id"), unique_key("doc_id"), tokens_invariant()])
    assert len(res) == 3 and all("PASS" in v for v in res.values())


def test_freshness_check(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    latest = ev.agg(F.max("ts")).collect()[0][0]
    now = lambda: latest.timestamp() + 60  # noqa: E731
    assert "PASS" in run_checks(ev, [freshness("ts", 3600, now=now)])[
        "freshness_ts"
    ]
    with pytest.raises(VerificationError, match="freshness"):
        run_checks(ev, [freshness("ts", 30, now=now)])


def test_dense_per_group_detects_violations(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    # testdata lineitem has gaps per order (driver synthetic) — the
    # check must flag exactly the groups where max(linenumber) != count
    bad = dense_per_group(li, "l_orderkey", "l_linenumber")
    manual = (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n"), F.max("l_linenumber").alias("m"))
        .where(F.col("m") != F.col("n"))
        .count()
    )
    assert bad.count() == manual


def test_counts_reconcile(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    # trivially true: count of orders == count of orders
    ok, detail = counts_reconcile(o.groupBy().agg(F.count("*").alias("c")), F.sum("c"), o)
    assert ok, detail


def test_tailer_runs_post_batch_checks(spark, tmp_path):
    cfg = FeedConfig(n_docs=200, events_per_batch=400, n_batches=2, dup_tail=50)
    feed = str(tmp_path / "feed")
    write_feed(spark, cfg, feed)
    tailer = ChangeLogTailer(
        spark,
        feed,
        str(tmp_path / "t"),
        app_id="vt",
        num_buckets=8,
        post_batch_checks=[unique_key("doc_id"), tokens_invariant()],
    )
    applied = tailer.replay_batches()
    assert len(applied) == 2
    for li in applied:
        assert all("PASS" in v for v in li["checks"].values())
