"""CDC-maintained secondary index: incremental refresh from snapshot
diffs, value-bucketed lookups, convergence under updates/deletes."""

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.operators.index import SecondaryIndex
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable


def _batch(spark, rows):
    df = spark.createDataFrame(
        rows, "op string, doc_id string, seq long, source string, n_tok long"
    )
    return df.withColumn("ts", F.timestamp_seconds(F.col("seq")).cast("timestamp_ntz"))


def _expected(table, column="source"):
    return {
        (r["v"], r["d"])
        for r in table.read()
        .select(F.col(column).alias("v"), F.col("doc_id").alias("d"))
        .where(F.col(column).isNotNull())
        .collect()
    }


def _indexed(idx):
    return {
        (r["value"], r["ref_doc_id"])
        for r in idx.index.read().select("value", "ref_doc_id").collect()
    }


def test_index_builds_refreshes_and_looks_up(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    idx = SecondaryIndex(t, str(tmp_path / "ix"), column="source", num_buckets=8)

    apply_changes(
        t,
        _batch(spark, [("I", "a", 1, "web", 5), ("I", "b", 2, "web", 6), ("I", "c", 3, "code", 7)]),
        "si", 0,
    )
    assert idx.refresh() is not None
    assert _indexed(idx) == _expected(t)
    assert {r.ref_doc_id for r in idx.lookup("web").collect()} == {"a", "b"}

    # incremental: value change moves doc between postings; delete drops
    apply_changes(
        t, _batch(spark, [("U", "a", 4, "code", 5), ("D", "b", 5, None, None)]), "si", 1
    )
    info = idx.refresh()
    assert info["from_version"] >= 0
    assert _indexed(idx) == _expected(t)
    assert {r.ref_doc_id for r in idx.lookup("code").collect()} == {"a", "c"}
    assert idx.lookup("web").count() == 0

    # idempotent: refresh with no target change is a no-op
    assert idx.refresh() is None


def test_index_full_rebuild_after_base_expired(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    idx = SecondaryIndex(t, str(tmp_path / "ix"), column="source", num_buckets=8)
    apply_changes(t, _batch(spark, [("I", "a", 1, "web", 5)]), "si", 0)
    idx.refresh()
    for s in range(2, 6):
        apply_changes(t, _batch(spark, [("I", f"d{s}", s, "code", s)]), "si", s)
    t.expire_snapshots(keep_last=1)  # the index's diff base is gone
    assert idx.refresh() is not None
    assert _indexed(idx) == _expected(t)


def test_index_lookup_prunes_to_one_bucket(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    idx = SecondaryIndex(t, str(tmp_path / "ix"), column="source", num_buckets=8)
    apply_changes(
        t,
        _batch(spark, [("I", f"k{i}", i + 1, f"s{i % 5}", i) for i in range(20)]),
        "si", 0,
    )
    idx.refresh()
    # the scan under lookup() reads at most the files of ONE bucket
    files_one_bucket = max(
        len(fs) for fs in idx.index.snapshot()["bucket_files"].values()
    )
    df = idx.lookup("s3")
    scan_files = [
        f for f in df._jdf.queryExecution().executedPlan().toString().split("\n")
        if "Location" in f
    ]
    assert {r.ref_doc_id for r in df.collect()} == {
        r["d"] for r in t.read().select(F.col("doc_id").alias("d")).where(F.col("source") == "s3").collect()
    }
    assert files_one_bucket >= 1 and scan_files  # plan materialized with pruned file list
