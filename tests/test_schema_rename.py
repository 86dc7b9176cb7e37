"""Metadata-only column rename/drop (SnapshotTable.rename_column /
drop_column) — the schema-evolution axis beyond add-column and
int-widening: old files keep their write-time physical names and are
read through a name-mapped schema (the Iceberg field-id rename,
expressed as a file-scoped layer like the merge-on-read deletes).

Reference parity: the reference evolves schemas by explicit ALTER
TABLE migrations (docs/eip_*.md) — renames there would force a table
rewrite; here they are one manifest commit.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable


def _changes(spark, rows, schema="op string, doc_id string, seq long, eid long, val string"):
    return spark.createDataFrame(rows, schema)


def _table(spark, tmp_path, name="t", **kw):
    kw.setdefault("num_buckets", 4)
    kw.setdefault("compact_files", 100)
    kw.setdefault("stats_cols", ["eid"])
    return SnapshotTable(spark, str(tmp_path / name), **kw)


def _ingest(spark, t, n=40):
    rows = [("U", str(i), i, i, f"v{i}") for i in range(n)]
    apply_changes(t, _changes(spark, rows[: n // 2]), "st", epoch=0)
    apply_changes(t, _changes(spark, rows[n // 2 :]), "st", epoch=1)
    return rows


def test_rename_is_metadata_only_and_reads_old_files(spark, tmp_path):
    t = _table(spark, tmp_path)
    _ingest(spark, t, n=40)
    files_before = {
        f for fs in t.snapshot()["bucket_files"].values() for f in fs
    }
    t.rename_column("val", "payload")
    snap = t.snapshot()
    assert {f for fs in snap["bucket_files"].values() for f in fs} == files_before
    got = {int(r["doc_id"]): r["payload"] for r in t.read().collect()}
    assert got[7] == "v7"
    assert "val" not in t.read().columns
    # new batches write the NEW name; mixed generations fold together
    apply_changes(
        t,
        _changes(
            spark,
            [("U", "7", 1007, 7, "new7")],
            "op string, doc_id string, seq long, eid long, payload string",
        ),
        "st",
        epoch=2,
    )
    got = {int(r["doc_id"]): r["payload"] for r in t.read().collect()}
    assert got[7] == "new7" and got[8] == "v8"


def test_rename_chain_unwinds_oldest_files(spark, tmp_path):
    t = _table(spark, tmp_path)
    _ingest(spark, t, n=20)
    t.rename_column("val", "v2")
    apply_changes(
        t,
        _changes(
            spark,
            [("U", "50", 50, 50, "gen2")],
            "op string, doc_id string, seq long, eid long, v2 string",
        ),
        "st",
        epoch=2,
    )
    t.rename_column("v2", "v3")
    got = {int(r["doc_id"]): r["v3"] for r in t.read().collect()}
    assert got[3] == "v3" and got[50] == "gen2"
    # lookup + range paths go through the same translated scan
    assert t.lookup(["3"]).collect()[0]["v3"] == "v3"


def test_compaction_drains_rename_layers(spark, tmp_path):
    t = _table(spark, tmp_path)
    _ingest(spark, t, n=20)
    t.rename_column("val", "payload")
    assert t.snapshot().get("rename_layers")
    t.compact()
    assert not t.snapshot().get("rename_layers")
    got = {int(r["doc_id"]): r["payload"] for r in t.read().collect()}
    assert got[3] == "v3"
    # old name reusable after the drain
    apply_changes(
        t,
        _changes(
            spark,
            [("U", "99", 99, 99, "x")],
            "op string, doc_id string, seq long, eid long, val string",
        ),
        "st",
        epoch=2,
    )
    assert "val" in t.read().columns


def test_old_name_reuse_blocked_while_layer_lives(spark, tmp_path):
    t = _table(spark, tmp_path)
    _ingest(spark, t, n=20)
    t.rename_column("val", "payload")
    with pytest.raises(ValueError, match="compact"):
        apply_changes(
            t,
            _changes(spark, [("U", "99", 99, 99, "x")]),
            "st",
            epoch=2,
        )


def test_delete_layer_predicate_follows_rename(spark, tmp_path):
    t = _table(spark, tmp_path)
    _ingest(spark, t, n=40)
    t.delete_where_lazy("eid", lo=10, hi=19)
    t.rename_column("eid", "event_num")
    got = sorted(int(r["doc_id"]) for r in t.read().collect())
    assert got == [i for i in range(40) if not (10 <= i <= 19)]
    t.compact()
    assert sorted(int(r["doc_id"]) for r in t.read().collect()) == got


def test_drop_column_metadata_only(spark, tmp_path):
    t = _table(spark, tmp_path)
    _ingest(spark, t, n=20)
    t.drop_column("val")
    df = t.read()
    assert "val" not in df.columns
    assert df.count() == 20
    with pytest.raises(ValueError):
        t.drop_column("doc_id")
    with pytest.raises(ValueError):
        t.rename_column("_seq", "s")


def test_time_travel_across_rename(spark, tmp_path):
    t = _table(spark, tmp_path)
    _ingest(spark, t, n=20)
    v_before = t.current_version()
    t.rename_column("val", "payload")
    old = t.read(version=v_before)
    assert "val" in old.columns and old.where(F.col("val") == "v3").count() == 1


def test_history_of_versions_newest_first(spark, tmp_path):
    t = _table(spark, tmp_path)
    _ingest(spark, t, n=10)
    apply_changes(t, _changes(spark, [("U", "3", 103, 3, "v3b")]), "st", epoch=2)
    apply_changes(t, _changes(spark, [("D", "3", 203, None, None)]), "st", epoch=3)
    hist = t.history_of(["3"]).collect()
    assert [r["_seq"] for r in hist] == [203, 103, 3]
    assert hist[0]["_tombstone"] is True and hist[1]["val"] == "v3b"
    # compaction folds history away (LSM semantics)
    t.compact()
    assert len(t.history_of(["3"]).collect()) == 1


def test_zero_copy_clone_reads_and_diverges(spark, tmp_path):
    t = _table(spark, tmp_path)
    _ingest(spark, t, n=20)
    t.delete_where_lazy("eid", lo=0, hi=4)  # clone must carry the layer
    clone = t.clone_to(str(tmp_path / "clone"))
    import os

    assert os.listdir(clone._data) == []  # no data copied
    ids = lambda x: sorted(int(r["doc_id"]) for r in x.read().collect())
    assert ids(clone) == ids(t) == list(range(5, 20))
    # divergent writes: clone-only update, source unchanged
    apply_changes(
        clone, _changes(spark, [("U", "7", 1007, 7, "cloned")]), "st", epoch=2
    )
    assert {r["doc_id"]: r["val"] for r in clone.read().collect()}["7"] == "cloned"
    assert {r["doc_id"]: r["val"] for r in t.read().collect()}["7"] == "v7"
    # compaction localizes the clone's data under its own root
    clone.compact()
    for fs in clone.snapshot()["bucket_files"].values():
        for f in fs:
            assert not os.path.isabs(f)
    assert ids(clone) == sorted([i for i in range(5, 20)])


def test_timestamp_time_travel_and_rollback(spark, tmp_path):
    import time as _time

    t = _table(spark, tmp_path)
    apply_changes(t, _changes(spark, [("U", "1", 1, 1, "a")]), "st", epoch=0)
    ts_after_first = _time.time()
    v1 = t.current_version()
    _time.sleep(0.05)
    apply_changes(t, _changes(spark, [("U", "1", 2, 1, "b"), ("U", "2", 3, 2, "c")]), "st", epoch=1)
    # TIMESTAMP AS OF resolves to the newest snapshot <= ts
    assert t.version_as_of(ts_after_first) == v1
    assert t.version_as_of(_time.time()) == t.current_version()
    got = t.read(version=t.version_as_of(ts_after_first)).collect()
    assert [(r["doc_id"], r["val"]) for r in got] == [("1", "a")]
    # rollback publishes a NEW version with the old content
    head_before = t.current_version()
    rb = t.rollback_to(v1)
    assert rb["version"] > head_before
    assert {(r["doc_id"], r["val"]) for r in t.read().collect()} == {("1", "a")}
    # rolled-over history remains readable; fences stay current
    assert {(r["doc_id"], r["val"]) for r in t.read(version=head_before).collect()} == {
        ("1", "b"),
        ("2", "c"),
    }
    assert t.last_epoch("st") == 1
    # the feed continues on top of the rollback
    apply_changes(t, _changes(spark, [("U", "3", 9, 3, "d")]), "st", epoch=2)
    assert {r["doc_id"] for r in t.read().collect()} == {"1", "3"}
