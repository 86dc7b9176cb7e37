"""Schema-relaxation variants (ref adjust_schema_for_kovan,
build_load_dag.py:351-376: INT->FLOAT64 widening + REQUIRED->NULLABLE),
exercised mid-stream through the CDC apply path."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable


def _batch(spark, rows, score_type, score_nullable=True):
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("score", score_type, score_nullable),
            T.StructField("source", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_seconds(F.col("seq")).cast("timestamp_ntz")
    )


class TestEvolveSchemaUnit:
    def test_int_to_double_widens(self):
        old = T.StructType([T.StructField("x", T.IntegerType(), True)])
        new = T.StructType([T.StructField("x", T.DoubleType(), True)])
        out = SnapshotTable._evolve_schema(old, new)
        assert isinstance(out["x"].dataType, T.DoubleType)

    def test_int_to_long_still_widens(self):
        old = T.StructType([T.StructField("x", T.IntegerType(), True)])
        new = T.StructType([T.StructField("x", T.LongType(), True)])
        assert isinstance(
            SnapshotTable._evolve_schema(old, new)["x"].dataType, T.LongType
        )

    def test_required_to_nullable_relaxes_and_sticks(self):
        old = T.StructType([T.StructField("x", T.LongType(), False)])
        new = T.StructType([T.StructField("x", T.LongType(), True)])
        out = SnapshotTable._evolve_schema(old, new)
        assert out["x"].nullable
        # a later strict batch cannot re-tighten it
        again = SnapshotTable._evolve_schema(out, old)
        assert again["x"].nullable

    def test_narrower_batch_keeps_wide_type(self):
        old = T.StructType([T.StructField("x", T.DoubleType(), True)])
        new = T.StructType([T.StructField("x", T.IntegerType(), True)])
        assert isinstance(
            SnapshotTable._evolve_schema(old, new)["x"].dataType, T.DoubleType
        )

    def test_long_to_double_rejected(self):
        old = T.StructType([T.StructField("x", T.LongType(), True)])
        new = T.StructType([T.StructField("x", T.DoubleType(), True)])
        with pytest.raises(ValueError, match="long->double"):
            SnapshotTable._evolve_schema(old, new)


class TestMidStreamRelaxation:
    def test_int_to_double_mid_stream(self, spark, tmp_path):
        """Batches 0-1 write score as INT; batch 2 switches to DOUBLE
        (the kovan difficulty INT->FLOAT64 case). Old int32 files must
        scan through the widened double schema, and the folded state
        must mix both generations correctly."""
        table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
        apply_changes(
            table,
            _batch(spark, [("I", "a", 1, 10, "web"), ("I", "b", 2, 20, "web")], T.IntegerType()),
            "sr", 0,
        )
        apply_changes(
            table, _batch(spark, [("I", "c", 3, 30, "web")], T.IntegerType()), "sr", 1
        )
        apply_changes(
            table,
            _batch(spark, [("U", "b", 4, 2.5, "web"), ("I", "d", 5, 4.25, "web")], T.DoubleType()),
            "sr", 2,
        )
        final = table.read()
        assert dict(final.dtypes)["score"] == "double"
        got = {r.doc_id: r.score for r in final.collect()}
        assert got == {"a": 10.0, "b": 2.5, "c": 30.0, "d": 4.25}

    def test_required_to_nullable_mid_stream(self, spark, tmp_path):
        """First batches declare score NOT NULL; a later network variant
        sends nullable score with an actual null — the table relaxes
        and the null lands."""
        table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
        apply_changes(
            table,
            _batch(spark, [("I", "a", 1, 10, "web")], T.IntegerType(), score_nullable=False),
            "sr", 0,
        )
        assert not table.schema()["score"].nullable
        apply_changes(
            table,
            _batch(spark, [("I", "b", 2, None, "web")], T.IntegerType(), score_nullable=True),
            "sr", 1,
        )
        assert table.schema()["score"].nullable
        got = {r.doc_id: r.score for r in table.read().collect()}
        assert got == {"a": 10, "b": None}

    def test_long_to_double_mid_stream_fails_loudly(self, spark, tmp_path):
        table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
        apply_changes(
            table, _batch(spark, [("I", "a", 1, 10, "web")], T.LongType()), "sr", 0
        )
        with pytest.raises(ValueError, match="long->double"):
            apply_changes(
                table, _batch(spark, [("I", "b", 2, 1.5, "web")], T.DoubleType()), "sr", 1
            )
