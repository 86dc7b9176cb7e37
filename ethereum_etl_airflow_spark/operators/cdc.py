"""CDC apply: keyed MERGE of a change batch into the snapshot table.

Semantics (the generalized form of the reference's MERGE operators —
``parse/sqls/merge_table.sql:1-15`` partition overwrite and
``build_load_dag_redshift.py:107-119`` keyed delete-insert):

  MERGE INTO target t USING batch s ON t.doc_id = s.doc_id
    WHEN MATCHED AND s.seq >= t._seq AND s.op = 'D' THEN UPDATE SET _tombstone = true
    WHEN MATCHED AND s.seq >= t._seq THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *  -- deletes insert a tombstone

Deletes are retained as tombstone rows (``_tombstone = true``, payload
nulled, ``_seq`` kept) rather than physically removed: a late event
with a lower seq than a delete must NOT resurrect the key, which
requires remembering the delete's seq. ``SnapshotTable.read`` filters
tombstones for consumers; ``expire_tombstones`` GCs them once the feed
guarantees no older events can arrive (watermark).

Execution strategy (Spark-first, scale-first):

  1. tag batch rows pri=1 and target rows pri=0, union them, and take
     the last writer per key with ONE hash aggregation:
     ``groupBy(doc_id).agg(max_by(payload, struct(seq, pri)))``.
     A hash agg gets partial (map-side) combine for free, so a hot
     doc_id collapses to one row per input partition BEFORE the
     shuffle — in-batch dedup, cross-batch LWW and hot-key skew
     defense in a single operator. (A row_number window would sort
     and put every hot-key row through the shuffle.)
  2. only buckets touched by the batch are read back and rewritten
     (bucket = pmod(xxhash64(doc_id), B)) — copy-on-write merge cost
     scales with the batch's key spread, not with table size.
  3. exactly-once: the commit is fenced by (app_id, epoch) in the
     snapshot manifest; a replayed epoch is skipped before any work.

Metrics ride on ``DataFrame.observe`` — no extra pass over the data.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable, bucket_expr

META_COLS = {"op", "seq", "ts", "batch_id", "_seq", "_pri", "_bucket"}


def payload_columns(schema: T.StructType) -> list[str]:
    """Logical payload columns of a change batch (doc_id + data cols)."""
    return [f.name for f in schema.fields if f.name not in META_COLS]


def apply_changes(
    table: SnapshotTable,
    batch_df: DataFrame,
    app_id: str,
    epoch: int,
    verify: bool = True,
) -> dict | None:
    """Apply one change batch; returns lineage dict, or None if the
    epoch was already committed (fenced replay — exactly-once)."""
    t0 = time.time()
    if epoch <= table.last_epoch(app_id):
        return None

    pay_cols = payload_columns(batch_df.schema)

    obs_in = Observation(f"cdc_in_{epoch}")
    batch_df = batch_df.observe(
        obs_in,
        F.count(F.lit(1)).alias("events_in"),
        F.min("seq").alias("min_seq"),
        F.max("seq").alias("max_seq"),
        F.count_if(F.col("op") == "D").alias("deletes_in"),
    )

    src = batch_df.select(
        "op",
        F.col("seq").cast("long").alias("_seq"),
        F.lit(1).alias("_pri"),
        *pay_cols,
    )

    # schema evolution: union of target schema and the batch's payload
    # schema (added nullable columns, int->long widening)
    batch_payload_schema = T.StructType(
        [f for f in src.schema.fields if f.name in pay_cols or f.name == "_seq"]
        + [T.StructField("_tombstone", T.BooleanType(), True)]
    )
    old_schema = table.schema()
    new_schema = SnapshotTable._evolve_schema(old_schema, batch_payload_schema)

    src_bucketed = src.withColumn("_bucket", bucket_expr(F.col("doc_id"), table.num_buckets))
    touched = sorted(
        r[0] for r in src_bucketed.select("_bucket").distinct().collect()
    )

    if old_schema is not None:
        tgt = table.read_raw(touched).select(
            F.when(F.coalesce(F.col("_tombstone"), F.lit(False)), F.lit("D"))
            .otherwise(F.lit("I"))
            .alias("op"),
            F.col("_seq"),
            F.lit(0).alias("_pri"),
            *[c for c in pay_cols if c in {f.name for f in old_schema.fields}],
        )
        combined = src.unionByName(tgt, allowMissingColumns=True)
    else:
        combined = src

    # ONE hash agg: last writer (max (_seq, _pri)) per doc_id
    data_cols = [c for c in pay_cols if c != "doc_id"]
    winner = F.max_by(
        F.struct(F.col("op"), F.col("_seq"), *data_cols),
        F.struct(F.col("_seq"), F.col("_pri")),
    ).alias("w")
    folded = combined.groupBy("doc_id").agg(winner)

    final_cols = [f.name for f in new_schema.fields if f.name not in ("doc_id", "_tombstone")]
    obs_out = Observation(f"cdc_out_{epoch}")
    merged = (
        folded.select(
            "doc_id",
            *[
                F.col(f"w.{c}").cast(dict_schema_type(new_schema, c)).alias(c)
                for c in final_cols
            ],
            (F.col("w.op") == "D").alias("_tombstone"),
        )
        .withColumn("_bucket", bucket_expr(F.col("doc_id"), table.num_buckets))
        .observe(
            obs_out,
            F.count(F.lit(1)).alias("rows_out"),
            F.count_if(F.col("_tombstone")).alias("tombstones_out"),
        )
    )

    if verify:
        merged = check_invariants(merged)

    snap = table.commit_merge(
        merged,
        touched,
        app_id=app_id,
        epoch=epoch,
        new_schema=new_schema,
        lineage=None,  # filled below once observations resolve
    )

    wall = time.time() - t0
    m_in = _obs_get(obs_in, {"events_in": 0, "min_seq": None, "max_seq": None, "deletes_in": 0})
    m_out = _obs_get(obs_out, {"rows_out": 0, "tombstones_out": 0})
    lineage = {
        "app_id": app_id,
        "epoch": epoch,
        "snapshot_version": snap["version"],
        "events_in": m_in["events_in"],
        "deletes_in": m_in["deletes_in"],
        "offset_range": [m_in["min_seq"], m_in["max_seq"]],
        "touched_buckets": len(touched),
        "rows_out": m_out["rows_out"],
        "tombstones_out": m_out["tombstones_out"],
        "wall_sec": round(wall, 4),
        "events_per_sec": round(m_in["events_in"] / wall, 2) if wall > 0 else None,
    }
    return lineage


def _obs_get(obs: Observation, defaults: dict) -> dict:
    """Observation.get, tolerant of AQE empty-relation propagation: when
    a query stage is provably empty at runtime, AQE may eliminate the
    CollectMetrics node entirely, so no metrics row exists — which can
    only happen when every observed count is zero. Fall back to the
    zero defaults in that case."""
    try:
        return obs.get
    except Exception:
        return defaults


def dict_schema_type(schema: T.StructType, name: str) -> T.DataType:
    for f in schema.fields:
        if f.name == name:
            return f.dataType
    raise KeyError(name)


def check_invariants(merged: DataFrame) -> DataFrame:
    """Per-batch data-quality guard (reference: verify/sqls/*.sql run
    after every load, build_load_dag.py:220-234): every surviving row
    must satisfy n_tok == size(tokens). Expressed as a fail-fast
    column so it rides the write job — no extra pass."""
    cols = set(merged.columns)
    if {"tokens", "n_tok"} <= cols:
        violation = F.col("n_tok").isNotNull() & (
            F.col("n_tok").cast("long") != F.size("tokens").cast("long")
        )
        merged = merged.withColumn(
            "n_tok",
            F.when(
                violation,
                F.raise_error(F.concat(F.lit("invariant violated: n_tok != size(tokens) for doc_id="), F.col("doc_id"))),
            ).otherwise(F.col("n_tok")),
        )
    return merged
