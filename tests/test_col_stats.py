"""Per-file payload-column [min,max] stats in the manifest and the
driver-planned range scan over them (Iceberg DataFile
lower_bounds/upper_bounds file skipping)."""

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable, bucket_expr


def _write(spark, table, rows, epoch):
    """rows: list of (doc_id, val, tag)."""
    df = spark.createDataFrame(
        [(k, epoch * 100 + i, epoch, False, v, tg) for i, (k, v, tg) in enumerate(rows)],
        "doc_id string, _seq long, _epoch long, _tombstone boolean, val long, tag string",
    ).withColumn("_bucket", bucket_expr(F.col("doc_id"), table.num_buckets))
    table.commit(
        df, replace_buckets=set(), app_id="cs", epoch=epoch,
        new_schema=df.drop("_bucket").schema,
    )


def test_stats_recorded_and_pruned(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=1, stats_cols=["val", "tag"])
    _write(spark, t, [("a", 10, "x"), ("b", 19, "x")], 1)
    _write(spark, t, [("c", 100, "y"), ("d", 190, "y")], 2)
    _write(spark, t, [("e", 1000, "z"), ("f", 1900, "z")], 3)
    snap = t.snapshot()
    stats = snap["file_col_stats"]
    all_files = [f for fs in snap["bucket_files"].values() for f in fs]
    assert len(all_files) == 3 and set(stats) == set(all_files)
    for s in stats.values():
        assert set(s) == {"val", "tag"}

    # driver-side planning prunes to exactly the overlapping file(s)
    assert len(t.plan_where(snap, "val", lo=50, hi=500)) == 1
    assert len(t.plan_where(snap, "val", lo=0, hi=5)) == 0
    assert len(t.plan_where(snap, "val", lo=150)) == 2
    # string column ranges prune too
    assert len(t.plan_where(snap, "tag", lo="y", hi="y")) == 1

    # read_where == full scan + filter (values, not just counts)
    got = {r.doc_id: r.val for r in t.read_where("val", lo=50, hi=500).collect()}
    assert got == {"c": 100, "d": 190}
    got = {r.doc_id for r in t.read_where("tag", lo="x", hi="y").collect()}
    assert got == {"a", "b", "c", "d"}


def test_pre_stats_files_always_scanned(spark, tmp_path):
    # first commits land WITHOUT stats
    t0 = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=1)
    _write(spark, t0, [("a", 10, "x")], 1)
    # reopen with stats enabled; later commits get entries
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=1, stats_cols=["val"])
    _write(spark, t, [("b", 1000, "y")], 2)
    snap = t.snapshot()
    assert len(snap["file_col_stats"]) == 1  # only the new file
    # a range that excludes the new file still scans the old one
    rels = t.plan_where(snap, "val", lo=0, hi=50)
    assert len(rels) == 1
    got = {r.doc_id for r in t.read_where("val", lo=0, hi=50).collect()}
    assert got == {"a"}


def test_compaction_refreshes_stats(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=1, stats_cols=["val"])
    _write(spark, t, [("a", 10, "x")], 1)
    _write(spark, t, [("b", 1000, "y")], 2)
    t.compact([0])
    snap = t.snapshot()
    files = [f for fs in snap["bucket_files"].values() for f in fs]
    assert len(files) == 1
    # the compacted file's range spans both inputs; dead entries dropped
    assert set(snap["file_col_stats"]) == set(files)
    assert snap["file_col_stats"][files[0]]["val"] == [10, 1000, 0]
    assert {r.doc_id for r in t.read_where("val", lo=0, hi=50).collect()} == {"a"}
