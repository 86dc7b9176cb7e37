"""CDF follow mode: a derived table maintained continuously from an
upstream table's change-data-feed — incremental (no full recompute),
exactly-once across crash/resume (r2 VERDICT missing #2; reference
live-view freshness chain, build_verify_streaming_dag.py:81-100)."""

import pyspark.sql.functions as F
import pytest

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable
from ethereum_etl_airflow_spark.streaming.cdf_follow import CdfFollower


def _batch(spark, rows):
    df = spark.createDataFrame(rows, "op string, doc_id string, seq long, val long")
    return df.withColumn("ts", F.timestamp_seconds(F.col("seq")).cast("timestamp_ntz"))


def _transform(df):
    return df.select("doc_id", (F.col("val") * 2).alias("val2"))


def _expected(upstream):
    return {
        r["doc_id"]: r["val"] * 2 for r in upstream.read().select("doc_id", "val").collect()
    }


def _got(follower):
    return {r["doc_id"]: r["val2"] for r in follower.read().collect()}


def test_follow_applies_increments_without_full_recompute(spark, tmp_path):
    up = SnapshotTable(spark, str(tmp_path / "up"), num_buckets=8)
    apply_changes(up, _batch(spark, [("I", f"k{i}", i + 1, i) for i in range(60)]), "cf", 0)
    f = CdfFollower(spark, up, str(tmp_path / "dv"), _transform)
    li1 = f.process_once()
    assert li1["rows_written"] == 60
    assert _got(f) == _expected(up)

    # small upstream delta -> small derived commit (NOT 60 rows again)
    apply_changes(
        up,
        _batch(spark, [("U", "k1", 100, 999), ("D", "k2", 101, None), ("I", "new", 102, 5)]),
        "cf",
        1,
    )
    li2 = f.process_once()
    assert li2["rows_written"] == 3  # 2 upserts + 1 tombstone
    assert li2["from_version"] == li1["to_version"]
    want = _expected(up)
    got = _got(f)
    assert got == want and "k2" not in got and got["k1"] == 1998

    # caught up -> no-op
    assert f.process_once() is None


def test_follow_resumes_exactly_once_after_crash(spark, tmp_path):
    up = SnapshotTable(spark, str(tmp_path / "up"), num_buckets=4)
    apply_changes(up, _batch(spark, [("I", "a", 1, 10), ("I", "b", 2, 20)]), "cf", 0)
    f1 = CdfFollower(spark, up, str(tmp_path / "dv"), _transform)
    f1.process_once()

    apply_changes(up, _batch(spark, [("U", "a", 3, 11), ("I", "c", 4, 30)]), "cf", 1)
    # crash BEFORE the derived commit: f1 dies here without processing.
    # A fresh follower (state only from disk) must apply the pending
    # range exactly once.
    f2 = CdfFollower(spark, up, str(tmp_path / "dv"), _transform)
    assert f2.cursor() == f1.cursor()
    li = f2.process_once()
    assert li is not None and li["rows_written"] == 2
    assert _got(f2) == {"a": 22, "b": 40, "c": 60}

    # crash AFTER the commit (replay of the same range): a third
    # follower sees the advanced cursor and does nothing
    f3 = CdfFollower(spark, up, str(tmp_path / "dv"), _transform)
    assert f3.process_once() is None
    assert _got(f3) == {"a": 22, "b": 40, "c": 60}


def test_run_until_caught_up_drains_multiple_versions(spark, tmp_path):
    up = SnapshotTable(spark, str(tmp_path / "up"), num_buckets=4)
    apply_changes(up, _batch(spark, [("I", "a", 1, 1)]), "cf", 0)
    apply_changes(up, _batch(spark, [("I", "b", 2, 2)]), "cf", 1)
    apply_changes(up, _batch(spark, [("U", "a", 3, 7), ("D", "b", 4, None)]), "cf", 2)
    f = CdfFollower(spark, up, str(tmp_path / "dv"), _transform)
    cycles = f.run_until_caught_up()
    # all pending versions drain in ONE net cycle (table_changes
    # collapses the whole range), cursor lands at the current version
    assert len(cycles) == 1 and f.cursor() == up.current_version()
    assert _got(f) == {"a": 14}


def test_transform_must_keep_doc_id(spark, tmp_path):
    up = SnapshotTable(spark, str(tmp_path / "up"), num_buckets=4)
    apply_changes(up, _batch(spark, [("I", "a", 1, 1)]), "cf", 0)
    f = CdfFollower(
        spark, up, str(tmp_path / "dv"), lambda df: df.select((F.col("val") * 2).alias("x"))
    )
    with pytest.raises(ValueError, match="doc_id"):
        f.process_once()


def test_follow_equals_full_recompute_under_churn(spark, tmp_path):
    """After many mixed batches, the incrementally-followed derived
    table must equal transform(upstream) computed from scratch."""
    up = SnapshotTable(spark, str(tmp_path / "up"), num_buckets=8)
    f = CdfFollower(spark, up, str(tmp_path / "dv"), _transform)
    rng_rows = [
        [("I", f"d{i}", i + 1, i * 3) for i in range(30)],
        [("U", f"d{i}", 100 + i, i * 5) for i in range(0, 30, 3)],
        [("D", f"d{i}", 200 + i, None) for i in range(0, 30, 7)],
        [("I", f"e{i}", 300 + i, i) for i in range(5)]
        + [("U", "d1", 400, 123), ("D", "e0", 401, None)],
    ]
    for ep, rows in enumerate(rng_rows):
        apply_changes(up, _batch(spark, rows), "cf", ep)
        f.run_until_caught_up()
    assert f.cursor() == up.current_version()
    assert _got(f) == _expected(up)
