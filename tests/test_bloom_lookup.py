"""Per-bucket Bloom filters in the manifest: negative point lookups
skip buckets without opening data files; positives unaffected."""

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable, bucket_expr


def _write(spark, table, keys, seq, replace=False):
    df = spark.createDataFrame(
        [(k, seq, seq, False, len(k)) for k in keys],
        "doc_id string, _seq long, _epoch long, _tombstone boolean, val long",
    ).withColumn("_bucket", bucket_expr(F.col("doc_id"), table.num_buckets))
    table.commit(
        df,
        replace_buckets=set(range(table.num_buckets)) if replace else set(),
        app_id="bl",
        epoch=seq,
        new_schema=df.drop("_bucket").schema,
    )


def test_bloom_negative_lookup_skips_all_buckets(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4, bloom_bits=4096)
    _write(spark, t, [f"doc-{i}" for i in range(50)], seq=1)
    snap = t.snapshot()
    assert snap["bloom_bits"] == 4096 and snap["bucket_blooms"]
    # present keys found
    got = {r.doc_id for r in t.lookup(["doc-3", "doc-44"]).collect()}
    assert got == {"doc-3", "doc-44"}
    # absent keys: empty result (and with 4096 bits / 50 keys the bloom
    # should reject without reading; assert via the fast-path row count)
    assert t.lookup(["nope-1", "nope-2"]).count() == 0


def test_bloom_merges_across_delta_commits(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4, bloom_bits=4096)
    _write(spark, t, ["a", "b"], seq=1)
    _write(spark, t, ["c", "d"], seq=2)
    got = {r.doc_id for r in t.lookup(["a", "d"]).collect()}
    assert got == {"a", "d"}


def test_bloom_reset_on_compaction(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4, bloom_bits=4096)
    _write(spark, t, ["a", "b", "c"], seq=1)
    before = t.snapshot()["bucket_blooms"]
    _write(spark, t, ["a", "b", "c"], seq=2, replace=True)
    after = t.snapshot()["bucket_blooms"]
    # replaced buckets recompute from the compacted content — still
    # findable, and the filter stays bounded (no unbounded bit creep)
    assert {r.doc_id for r in t.lookup(["b"]).collect()} == {"b"}
    assert set(after) == set(before)


def test_bloom_disabled_table_ignores_blooms(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    _write(spark, t, ["a", "b"], seq=1)
    assert "bucket_blooms" not in t.snapshot()
    assert {r.doc_id for r in t.lookup(["a"]).collect()} == {"a"}
