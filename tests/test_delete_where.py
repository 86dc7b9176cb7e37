"""Predicate DELETE with metadata pruning (SnapshotTable.delete_where).

Covers both paths (metadata-only bucket drops vs folded rewrites), the
LWW-resurrection guard that motivates the whole-bucket drop condition,
tombstone mode under a live feed, and time travel across the delete.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable


def _changes(spark, rows):
    """rows: (op, doc_id, seq, eid, val)"""
    df = spark.createDataFrame(
        rows, "op string, doc_id string, seq long, eid long, val string"
    )
    return df


def _table(spark, tmp_path, name="t", **kw):
    kw.setdefault("num_buckets", 4)
    kw.setdefault("stats_cols", ["eid"])
    return SnapshotTable(spark, str(tmp_path / name), **kw)


def _ingest_band(spark, table, n=60):
    """Three seq-ordered commits; each file's eid range is tight."""
    rows = [("U", str(i), i, i, f"v{i}") for i in range(n)]
    for e, (a, b) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        apply_changes(table, _changes(spark, rows[a:b]), "st", epoch=e)
    return rows


def test_rewrite_band_delete_and_time_travel(spark, tmp_path):
    t = _table(spark, tmp_path)
    _ingest_band(spark, t, n=60)
    v_before = t.current_version()
    rep = t.delete_where("eid", lo=20, hi=39)
    assert rep["rows_deleted_rewrite"] == 20
    assert rep["buckets_rewritten"] >= 1
    got = sorted(int(r["doc_id"]) for r in t.read().collect())
    assert got == [i for i in range(60) if not (20 <= i <= 39)]
    # stats false positives are fine; stats survivors must be consistent:
    # a fresh range scan over the deleted band returns nothing
    from ethereum_etl_airflow_spark.sinks.snapshot_table import fold_lww

    band = fold_lww(t.read_where("eid", lo=20, hi=39)).where(
        ~F.coalesce(F.col("_tombstone"), F.lit(False))
    )
    assert band.count() == 0
    # pre-delete snapshot still shows the band (until expire_snapshots)
    assert t.read(version=v_before).where(F.col("eid").between(20, 39)).count() == 20


def test_metadata_only_full_drop(spark, tmp_path):
    t = _table(spark, tmp_path)
    _ingest_band(spark, t, n=60)
    rep = t.delete_where("eid")  # unbounded range: every file fully in
    assert rep["buckets_rewritten"] == 0
    assert rep["buckets_dropped_metadata_only"] >= 1
    assert rep["files_dropped"] > 0
    assert t.read().count() == 0
    # lineage records the metadata-only drop
    lin = t.snapshot()["lineage"]
    assert lin["op"] == "delete_where" and lin["buckets_rewritten"] == []


def test_no_resurrection_of_older_version(spark, tmp_path):
    """Key '7' has an old row (eid=5) in commit 0 and its CURRENT row
    (eid=100) in commit 1. Deleting [90,110] must remove the key
    entirely — a naive per-file drop of the in-range file would have
    resurrected eid=5."""
    t = _table(spark, tmp_path)
    apply_changes(
        t,
        _changes(spark, [("U", "7", 1, 5, "old"), ("U", "8", 1, 6, "keep")]),
        "st",
        epoch=0,
    )
    apply_changes(
        t, _changes(spark, [("U", "7", 2, 100, "new")]), "st", epoch=1
    )
    rep = t.delete_where("eid", lo=90, hi=110)
    assert rep["buckets_dropped_metadata_only"] == 0  # mixed bucket -> rewrite
    rows = {r["doc_id"]: r["eid"] for r in t.read().collect()}
    assert "7" not in rows
    assert rows["8"] == 6


def test_tombstone_mode_blocks_stale_reinsert(spark, tmp_path):
    t = _table(spark, tmp_path)
    apply_changes(
        t,
        _changes(spark, [("U", "1", 10, 50, "a"), ("U", "2", 11, 51, "b")]),
        "st",
        epoch=0,
    )
    rep = t.delete_where("eid", lo=50, hi=50, tombstones=True)
    assert rep["rows_deleted_rewrite"] == 1
    assert {r["doc_id"] for r in t.read().collect()} == {"2"}
    raw = {r["doc_id"]: r for r in t.read_raw().collect()}
    assert raw["1"]["_tombstone"] is True
    assert raw["1"]["_seq"] == 10  # verdict pinned at the deleted row's seq
    assert raw["1"]["val"] is None and raw["1"]["eid"] is None  # payload erased
    # a LATE stale event (seq < 10) cannot resurrect the key...
    apply_changes(
        t, _changes(spark, [("U", "1", 5, 50, "stale")]), "st", epoch=1
    )
    assert {r["doc_id"] for r in t.read().collect()} == {"2"}
    # ...but a genuinely newer event wins
    apply_changes(
        t, _changes(spark, [("U", "1", 20, 52, "fresh")]), "st", epoch=2
    )
    rows = {r["doc_id"]: r["val"] for r in t.read().collect()}
    assert rows["1"] == "fresh"


def test_delete_outside_data_is_noop(spark, tmp_path):
    t = _table(spark, tmp_path)
    _ingest_band(spark, t, n=30)
    v = t.current_version()
    rep = t.delete_where("eid", lo=10_000, hi=20_000)
    assert rep == {
        "files_dropped": 0,
        "buckets_rewritten": 0,
        "rows_deleted": 0,
        "version": v,
    }
    assert t.current_version() == v  # no commit published


def test_metadata_drop_never_kills_null_payload_tombstones(spark, tmp_path):
    """Parquet min/max IGNORE nulls: a file whose eid range lies fully
    inside the delete range can still hold a feed tombstone (null
    payload). Dropping it metadata-only would erase the tombstone and
    let a stale event resurrect the key (found by Hypothesis). The
    null_count term in the stats entry must force the rewrite path."""
    t = _table(spark, tmp_path, num_buckets=1)
    apply_changes(
        t, _changes(spark, [("U", "a", 1, 46, "x"), ("U", "b", 2, 30, "y")]), "st", 0
    )
    # feed DELETE for 'a': tombstone row with null eid in the same bucket
    apply_changes(
        t,
        spark.createDataFrame(
            [("D", "a", 5, None, None)],
            "op string, doc_id string, seq long, eid long, val string",
        ),
        "st",
        1,
    )
    rep = t.delete_where("eid", lo=0, hi=50)
    # the tombstone file's stats cover only non-null rows -> must rewrite
    assert rep["buckets_dropped_metadata_only"] == 0
    assert rep["buckets_rewritten"] == 1
    # stale re-emission below the tombstone's seq must NOT resurrect 'a'
    apply_changes(
        t, _changes(spark, [("U", "a", 3, 46, "stale")]), "st", 2
    )
    assert t.read().count() == 0
