"""Online partition-spec evolution: rebucket() rewrites the table into
a new hash fan-out atomically; state, lookups, time travel, and
subsequent CDC ingest all keep working."""

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable


def _batch(spark, rows):
    df = spark.createDataFrame(rows, "op string, doc_id string, seq long, val long")
    return df.withColumn("ts", F.timestamp_seconds(F.col("seq")).cast("timestamp_ntz"))


def _state(t):
    return {r.doc_id: r.val for r in t.read().collect()}


def test_rebucket_preserves_state_and_serves_lookups(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    apply_changes(
        t, _batch(spark, [("I", f"k{i}", i + 1, i * 10) for i in range(40)]), "rb", 0
    )
    before = _state(t)
    v_old = t.current_version()
    t.rebucket(16)
    assert t.num_buckets == 16
    assert int(t.snapshot()["num_buckets"]) == 16
    assert len(t.snapshot()["bucket_files"]) > 4  # really re-fanned
    assert _state(t) == before
    assert {r.doc_id for r in t.lookup(["k3", "k17"]).collect()} == {"k3", "k17"}
    # time travel to the pre-rebucket snapshot still prunes correctly
    assert {r.doc_id for r in t.lookup(["k3"], version=v_old).collect()} == {"k3"}


def test_ingest_continues_after_rebucket(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=2)
    apply_changes(t, _batch(spark, [("I", "a", 1, 1), ("I", "b", 2, 2)]), "rb", 0)
    t.rebucket(8)
    apply_changes(t, _batch(spark, [("U", "a", 3, 99), ("I", "c", 4, 3)]), "rb", 1)
    assert _state(t) == {"a": 99, "b": 2, "c": 3}
    # new writes landed in the 8-bucket layout
    assert all(int(b) < 8 for b in t.snapshot()["bucket_files"])


def test_fresh_instance_adopts_manifest_fanout(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    apply_changes(t, _batch(spark, [("I", "a", 1, 1)]), "rb", 0)
    t.rebucket(32)
    # a reader/writer created with a stale default must follow the manifest
    t2 = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    assert t2.num_buckets == 32
    apply_changes(t2, _batch(spark, [("I", "b", 2, 2)]), "rb", 1)
    assert _state(t2) == {"a": 1, "b": 2}


def test_rebucket_keeps_tombstones(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=2)
    apply_changes(t, _batch(spark, [("I", "a", 1, 1), ("I", "b", 2, 2)]), "rb", 0)
    apply_changes(t, _batch(spark, [("D", "a", 3, None)]), "rb", 1)
    t.rebucket(8)
    # the tombstone survives the rewrite: a late stale event cannot
    # resurrect the deleted key
    apply_changes(t, _batch(spark, [("U", "a", 2, 77)]), "rb", 2)
    assert _state(t) == {"b": 2}
