"""Column-projection pushdown through the merge-on-read fold.

``SnapshotTable.read(columns=[...])`` must narrow the parquet
ReadSchema to key + bookkeeping + the requested payload columns — on a
wide table the scan bytes drop proportionally (Iceberg column
projection). The fold still sees (_seq, _epoch, _tombstone), so LWW
and tombstone semantics are unchanged.
"""

from __future__ import annotations

import re

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable
from ethereum_etl_airflow_spark.sources.feed import FeedConfig, generate_batch

CFG = FeedConfig(n_docs=100, events_per_batch=250, n_batches=2, dup_tail=30)


def _read_schemas(df) -> list[str]:
    plan = df.sparkSession._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def test_projection_prunes_scan_and_matches_full_read(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    for b in range(CFG.n_batches):
        apply_changes(table, generate_batch(spark, CFG, b), "proj", epoch=b)

    narrow = table.read(columns=["n_tok"])
    # output surface: key + requested payload only
    assert narrow.columns == ["doc_id", "n_tok"]
    # scan surface: pruned below the fold — the wide payload columns
    # (tokens, source) never leave the parquet reader
    schemas = _read_schemas(narrow)
    assert schemas, "expected a parquet scan in the plan"
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",")}
        assert "tokens" not in cols and "source" not in cols
        assert {"doc_id", "_seq", "_epoch", "_tombstone", "n_tok"} <= cols

    # values identical to the projected full read (fold unchanged)
    full = {
        (r.doc_id, r.n_tok) for r in table.read().select("doc_id", "n_tok").collect()
    }
    got = {(r.doc_id, r.n_tok) for r in narrow.collect()}
    assert got == full and len(got) > 0


def test_projection_never_drops_tombstone_semantics(spark, tmp_path):
    import pyspark.sql.functions as F

    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=2)
    schema = "op string, doc_id string, seq long, tokens array<int>, n_tok int, source string"
    b0 = spark.createDataFrame(
        [("I", "a", 1, [1, 2], 2, "s"), ("I", "b", 2, [3], 1, "s")], schema
    ).withColumn("ts", F.timestamp_seconds(F.col("seq")).cast("timestamp_ntz"))
    b1 = spark.createDataFrame(
        [("D", "a", 3, None, None, None)], schema
    ).withColumn("ts", F.timestamp_seconds(F.col("seq")).cast("timestamp_ntz"))
    apply_changes(table, b0, "proj2", epoch=0)
    apply_changes(table, b1, "proj2", epoch=1)

    rows = table.read(columns=["n_tok"]).collect()
    assert [(r.doc_id, r.n_tok) for r in rows] == [("b", 1)]
