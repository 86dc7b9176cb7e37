"""Per-file _seq min/max skip index: replay-from-offset scans plan
their file set on the DRIVER from footer stats recorded at commit time.

Delta files are written per epoch, so their _seq ranges are tight and
disjoint — a `read_seq_range(lo, hi)` touches only the files whose
range overlaps, regardless of table size. Files without a recorded
range (pre-feature commits, stats unavailable) are always scanned —
never a false skip.
"""

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable, bucket_expr


def _write(spark, table, keys, seqs, replace=False):
    df = spark.createDataFrame(
        [(k, s, 1, False, len(k)) for k, s in zip(keys, seqs)],
        "doc_id string, _seq long, _epoch long, _tombstone boolean, val long",
    ).withColumn("_bucket", bucket_expr(F.col("doc_id"), table.num_buckets))
    table.commit(
        df,
        replace_buckets=set(range(table.num_buckets)) if replace else set(),
        app_id="sq",
        epoch=max(seqs),
        new_schema=df.drop("_bucket").schema,
    )


def test_manifest_records_per_file_seq_ranges(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=2)
    _write(spark, t, [f"a{i}" for i in range(10)], seqs=range(0, 10))
    _write(spark, t, [f"b{i}" for i in range(10)], seqs=range(100, 110))
    snap = t.snapshot()
    ranges = snap["file_seq_ranges"]
    live = {f for fs in snap["bucket_files"].values() for f in fs}
    assert set(ranges) == live
    for lo, hi in ranges.values():
        assert (0 <= lo <= hi <= 9) or (100 <= lo <= hi <= 109)


def test_plan_seq_range_skips_non_overlapping_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=2)
    _write(spark, t, [f"a{i}" for i in range(10)], seqs=range(0, 10))
    _write(spark, t, [f"b{i}" for i in range(10)], seqs=range(100, 110))
    snap = t.snapshot()
    planned = SnapshotTable.plan_seq_range(snap, 100, None)
    # only commit 2's files overlap [100, inf)
    assert planned and all(snap["file_seq_ranges"][f][0] >= 100 for f in planned)
    assert SnapshotTable.plan_seq_range(snap, 500, None) == []
    assert SnapshotTable.plan_seq_range(snap, None, -1) == []
    # full range plans everything
    live = {f for fs in snap["bucket_files"].values() for f in fs}
    assert set(SnapshotTable.plan_seq_range(snap, None, None)) == live


def test_read_seq_range_is_exact_not_just_file_granular(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=2)
    _write(spark, t, [f"a{i}" for i in range(10)], seqs=range(0, 10))
    got = {r._seq for r in t.read_seq_range(3, 6).collect()}
    assert got == {3, 4, 5, 6}  # file overlaps [0,9] but filter is exact
    assert t.read_seq_range(50, 99).count() == 0


def test_compaction_merges_ranges(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=1)
    _write(spark, t, ["a"], seqs=[1])
    _write(spark, t, ["b"], seqs=[50])
    # full replace: one merged file per bucket spanning both ranges
    df = t.read_files().withColumn(
        "_bucket", bucket_expr(F.col("doc_id"), t.num_buckets)
    )
    t.commit(df, replace_buckets={0}, app_id="sq", epoch=51)
    snap = t.snapshot()
    files = snap["bucket_files"]["0"]
    assert len(files) == 1
    assert snap["file_seq_ranges"][files[0]] == [1, 50]
    # the merged file is planned for either sub-range
    assert SnapshotTable.plan_seq_range(snap, 40, None) == files


def test_missing_entries_always_scanned(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=1)
    _write(spark, t, ["a", "b"], seqs=[1, 2])
    snap = dict(t.snapshot())
    snap.pop("file_seq_ranges", None)  # pre-feature manifest
    live = {f for fs in snap["bucket_files"].values() for f in fs}
    assert set(SnapshotTable.plan_seq_range(snap, 1000, None)) == live


def test_table_without_seq_column_unaffected(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=1)
    df = spark.createDataFrame(
        [("a", 1)], "doc_id string, val long"
    ).withColumn("_bucket", bucket_expr(F.col("doc_id"), 1))
    t.commit(df, replace_buckets=set(), app_id="sq", epoch=1,
             new_schema=df.drop("_bucket").schema)
    snap = t.snapshot()
    assert snap.get("file_seq_ranges") in (None, {})
    live = {f for fs in snap["bucket_files"].values() for f in fs}
    assert set(SnapshotTable.plan_seq_range(snap, 0, None)) == live


def test_time_travel_uses_that_versions_ranges(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=1)
    _write(spark, t, ["a"], seqs=[1])
    v1 = t.current_version()
    _write(spark, t, ["b"], seqs=[100])
    got = {r.doc_id for r in t.read_seq_range(0, 10, version=v1).collect()}
    assert got == {"a"}
    got2 = {r.doc_id for r in t.read_seq_range(0, None).collect()}
    assert got2 == {"a", "b"}
