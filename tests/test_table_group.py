"""Multi-table transactional commit (TableGroup): group readers never
see a half-applied batch; crash between member commits converges on
replay (group-level exactly-once)."""

import pyspark.sql.functions as F
import pytest

from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable, bucket_expr
from ethereum_etl_airflow_spark.sinks.table_group import TableGroup


def _out(spark, rows, schema, buckets=4):
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("_bucket", bucket_expr(F.col("doc_id"), buckets))


def _write(spark, rows, seq, buckets=4):
    df = spark.createDataFrame(
        [(d, seq, seq, False, v) for d, v in rows],
        "doc_id string, _seq long, _epoch long, _tombstone boolean, val long",
    )
    out = df.withColumn("_bucket", bucket_expr(F.col("doc_id"), buckets))
    return {"out_df": out, "replace_buckets": set(), "new_schema": out.drop("_bucket").schema}


@pytest.fixture
def group(spark, tmp_path):
    parent = SnapshotTable(spark, str(tmp_path / "parent"), num_buckets=4)
    child = SnapshotTable(spark, str(tmp_path / "child"), num_buckets=4)
    return TableGroup(str(tmp_path / "grp"), {"parent": parent, "child": child})


class TestAtomicGroupCommit:
    def test_commit_all_and_pinned_reads(self, spark, group):
        g = group.commit_all(
            {
                "parent": _write(spark, [("a", 1), ("b", 2)], seq=1),
                "child": _write(spark, [("a1", 10)], seq=1),
            },
            app_id="tx", epoch=0,
        )
        assert g["version"] == 0
        assert {r.doc_id for r in group.read("parent").collect()} == {"a", "b"}
        assert {r.doc_id for r in group.read("child").collect()} == {"a1"}

    def test_group_reader_never_sees_half_applied_batch(self, spark, group):
        group.commit_all(
            {"parent": _write(spark, [("a", 1)], 1), "child": _write(spark, [("c", 1)], 1)},
            app_id="tx", epoch=0,
        )
        # a direct writer advances the parent OUTSIDE the group boundary
        group.tables["parent"].commit(app_id="tx", epoch=1, **_write(spark, [("z", 9)], 2))
        # direct read sees it; the GROUP read stays pinned at the tx set
        assert {r.doc_id for r in group.tables["parent"].read().collect()} == {"a", "z"}
        assert {r.doc_id for r in group.read("parent").collect()} == {"a"}

    def test_crash_between_members_converges_on_replay(self, spark, group):
        group.commit_all(
            {"parent": _write(spark, [("a", 1)], 1), "child": _write(spark, [("c", 1)], 1)},
            app_id="tx", epoch=0,
        )
        # simulate a crash: epoch-1 attempt applied ONLY the parent, no
        # group manifest was written
        group.tables["parent"].commit(app_id="tx", epoch=1, **_write(spark, [("b", 2)], 2))
        assert group.last_epoch("tx") == 0  # group still at epoch 0
        assert {r.doc_id for r in group.read("parent").collect()} == {"a"}  # consistent
        # replay of the full epoch-1 transaction: parent is fenced
        # (no duplicate apply), child commits, group pointer advances once
        g = group.commit_all(
            {"parent": _write(spark, [("b", 2)], 2), "child": _write(spark, [("d", 2)], 2)},
            app_id="tx", epoch=1,
        )
        assert g is not None and group.last_epoch("tx") == 1
        assert group.tables["parent"].last_epoch("tx") == 1
        assert {r.doc_id for r in group.read("parent").collect()} == {"a", "b"}
        assert {r.doc_id for r in group.read("child").collect()} == {"c", "d"}
        # parent applied exactly once (fenced on replay, not duplicated)
        assert group.tables["parent"].read().where("doc_id = 'b'").count() == 1

    def test_group_epoch_fencing(self, spark, group):
        group.commit_all({"parent": _write(spark, [("a", 1)], 1)}, app_id="tx", epoch=0)
        assert group.commit_all(
            {"parent": _write(spark, [("x", 7)], 2)}, app_id="tx", epoch=0
        ) is None
        assert {r.doc_id for r in group.read("parent").collect()} == {"a"}

    def test_unwritten_member_keeps_version(self, spark, group):
        group.commit_all(
            {"parent": _write(spark, [("a", 1)], 1), "child": _write(spark, [("c", 1)], 1)},
            app_id="tx", epoch=0,
        )
        group.commit_all({"parent": _write(spark, [("b", 2)], 2)}, app_id="tx", epoch=1)
        assert {r.doc_id for r in group.read("child").collect()} == {"c"}
        assert {r.doc_id for r in group.read("parent").collect()} == {"a", "b"}

    def test_unknown_member_rejected(self, spark, group):
        with pytest.raises(KeyError):
            group.commit_all({"nope": _write(spark, [("a", 1)], 1)}, app_id="tx", epoch=0)
