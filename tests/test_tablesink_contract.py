"""TableSink contract suite — the proof harness for the Iceberg seam.

Parametrized over sink FACTORIES: today only SnapshotTable exists; when
an Iceberg jar is available, add a factory returning an Iceberg-backed
implementation and the identical suite certifies drop-in equivalence
(r2 VERDICT missing #3 / next #6). Contract semantics documented in
ethereum_etl_airflow_spark/sinks/contract.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from ethereum_etl_airflow_spark.sinks.contract import TableSink
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable, bucket_expr


def _snapshot_factory(spark, root, **kw):
    kw.setdefault("num_buckets", 4)
    return SnapshotTable(spark, root, **kw)


#: add an Iceberg-backed factory here when a jar lands; every test
#: below runs unchanged against it
SINK_FACTORIES = {"snapshot_table": _snapshot_factory}


@pytest.fixture(params=sorted(SINK_FACTORIES))
def make_sink(request, spark, tmp_path):
    counter = {"n": 0}

    def factory(**kw):
        counter["n"] += 1
        return SINK_FACTORIES[request.param](
            spark, str(tmp_path / f"sink{counter['n']}"), **kw
        )

    factory.reopen = lambda sink, **kw: SINK_FACTORIES[request.param](
        spark, sink.root, **kw
    )
    return factory


def _commit(spark, sink, rows, epoch, replace=False, schema_cols="val long"):
    df = spark.createDataFrame(
        [(k, s, epoch, dead, v) for k, s, dead, v in rows],
        f"doc_id string, _seq long, _epoch long, _tombstone boolean, {schema_cols}",
    ).withColumn("_bucket", bucket_expr(F.col("doc_id"), sink.num_buckets))
    return sink.commit(
        df,
        replace_buckets=set(range(sink.num_buckets)) if replace else set(),
        app_id="contract",
        epoch=epoch,
        new_schema=SnapshotTable._evolve_schema(sink.schema(), df.drop("_bucket").schema),
    )


def _state(sink):
    return {r["doc_id"]: r["val"] for r in sink.read().collect()}


class TestTableSinkContract:
    def test_satisfies_protocol(self, make_sink):
        assert isinstance(make_sink(), TableSink)

    def test_versioned_commits_advance(self, make_sink, spark):
        t = make_sink()
        assert not t.exists() and t.current_version() == -1
        _commit(spark, t, [("a", 1, False, 10)], epoch=1)
        assert t.exists() and t.current_version() == 0
        _commit(spark, t, [("b", 2, False, 20)], epoch=2)
        assert t.current_version() == 1
        assert _state(t) == {"a": 10, "b": 20}

    def test_epoch_fence_is_atomic_with_rows(self, make_sink, spark):
        t = make_sink()
        _commit(spark, t, [("a", 1, False, 10)], epoch=7)
        assert t.last_epoch("contract") == 7
        assert t.last_epoch("other_app") == -1
        # reopening from disk sees the same fence (crash-resume)
        assert make_sink.reopen(t).last_epoch("contract") == 7

    def test_lww_fold_and_tombstones(self, make_sink, spark):
        t = make_sink()
        _commit(spark, t, [("a", 1, False, 10), ("b", 2, False, 20)], epoch=1)
        _commit(spark, t, [("a", 5, False, 11), ("b", 6, True, None)], epoch=2)
        # late stale update must NOT resurrect b or downgrade a
        _commit(spark, t, [("a", 3, False, 99), ("b", 3, False, 99)], epoch=3)
        assert _state(t) == {"a": 11}
        raw = {r["doc_id"]: r["_tombstone"] for r in t.read_raw().collect()}
        assert raw["b"] is True  # tombstone retained with its seq

    def test_schema_evolution_add_and_widen(self, make_sink, spark):
        t = make_sink()
        df1 = spark.createDataFrame(
            [("a", 1, 1, False, 10)],
            T.StructType(
                [
                    T.StructField("doc_id", T.StringType()),
                    T.StructField("_seq", T.LongType()),
                    T.StructField("_epoch", T.LongType()),
                    T.StructField("_tombstone", T.BooleanType()),
                    T.StructField("val", T.IntegerType()),
                ]
            ),
        ).withColumn("_bucket", bucket_expr(F.col("doc_id"), t.num_buckets))
        t.commit(df1, set(), "contract", 1, new_schema=df1.drop("_bucket").schema)
        # widen val int->long AND add a nullable column
        df2 = spark.createDataFrame(
            [("b", 2, 2, False, 2**40, "x")],
            "doc_id string, _seq long, _epoch long, _tombstone boolean, val long, extra string",
        ).withColumn("_bucket", bucket_expr(F.col("doc_id"), t.num_buckets))
        t.commit(
            df2, set(), "contract", 2,
            new_schema=SnapshotTable._evolve_schema(t.schema(), df2.drop("_bucket").schema),
        )
        got = {r["doc_id"]: (r["val"], r["extra"]) for r in t.read().collect()}
        assert got == {"a": (10, None), "b": (2**40, "x")}
        fields = {f.name: f.dataType for f in t.schema().fields}
        assert fields["val"] == T.LongType()

    def test_incompatible_widening_refused(self, make_sink, spark):
        t = make_sink()
        _commit(spark, t, [("a", 1, False, 10)], epoch=1)  # val long
        with pytest.raises(ValueError, match="long->double"):
            SnapshotTable._evolve_schema(
                t.schema(),
                T.StructType([T.StructField("val", T.DoubleType())]),
            )

    def test_time_travel_and_maintenance_preserve_state(self, make_sink, spark):
        t = make_sink()
        _commit(spark, t, [("a", 1, False, 10)], epoch=1)
        v0 = t.current_version()
        _commit(spark, t, [("a", 2, False, 11), ("b", 2, False, 20)], epoch=2)
        before = _state(t)
        assert {r["doc_id"]: r["val"] for r in t.read(version=v0).collect()} == {"a": 10}
        t.compact()
        assert _state(t) == before  # logical state unchanged
        assert all(c == 1 for c in t.file_counts().values())

    def test_expire_snapshots_gc(self, make_sink, spark):
        t = make_sink()
        for e in range(1, 5):
            _commit(spark, t, [("a", e, False, e)], epoch=e, replace=True)
        removed = t.expire_snapshots(keep_last=1)
        assert removed > 0
        assert _state(t) == {"a": 4}  # newest snapshot intact
        with pytest.raises(FileNotFoundError):
            t.snapshot(0)

    def test_properties_roundtrip(self, make_sink, spark):
        t = make_sink()
        _commit(spark, t, [("a", 1, False, 1)], epoch=1)
        t.update_properties({"retention.keep_last": "3", "owner": "contract"})
        props = t.snapshot()["properties"]
        assert props["owner"] == "contract"
        # properties survive further data commits
        _commit(spark, t, [("b", 2, False, 2)], epoch=2)
        assert t.snapshot()["properties"]["owner"] == "contract"

    def test_lookup_matches_read(self, make_sink, spark):
        t = make_sink()
        rows = [(f"k{i}", 1, False, i) for i in range(30)]
        _commit(spark, t, rows, epoch=1)
        got = {r["doc_id"]: r["val"] for r in t.lookup(["k3", "k17", "nope"]).collect()}
        assert got == {"k3": 3, "k17": 17}
