"""CDC apply: merge-on-read upsert of a change batch into the snapshot table.

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
tombstones for consumers; ``SnapshotTable.expire_tombstones`` GCs them
once the feed guarantees no older events can arrive (watermark).

Execution strategy (Spark-first, scale-first — merge-on-read):

  1. **delta write, not table rewrite**: the batch lands as per-bucket
     DELTA files (bucket = pmod(xxhash64(doc_id), B)) with exactly ONE
     shuffle (the bucket repartition). Write cost is O(batch)
     regardless of table size — at 10^10 accumulated events a
     copy-on-write MERGE would rewrite the full table every batch;
     merge-on-read keeps per-batch cost flat.
  2. **read-side LWW fold**: readers and compaction collapse rows with
     one hash aggregation ``groupBy(doc_id).agg(max_by(row, (_seq,
     _epoch)))`` (``sinks.snapshot_table.fold_lww``) — duplicates,
     out-of-order updates, and cross-batch ordering resolve there.
     Partial (map-side) combine means a hot doc_id collapses to one
     row per input partition BEFORE the shuffle — dedup and hot-key
     skew defense in a single operator. (A row_number window would
     sort and push every hot-key row through the shuffle.) An optional
     in-batch fold (``fold_batch=True``) moves that work to the write
     side when batches carry many updates per key.
  3. **threshold compaction**: buckets whose file count reaches
     ``table.compact_files`` are folded back to one file INSIDE the
     same atomic commit — amortized O(log) rewrite like an LSM tree.
  4. **exactly-once**: the commit is fenced by (app_id, epoch) in the
     snapshot manifest; a replayed epoch is skipped before any work.
     The fold itself is idempotent at event level (same (doc_id, seq)
     -> same winner), so fencing avoids re-work — correctness never
     depends on it.

Metrics ride on ``DataFrame.observe`` — no extra pass over the data.
The per-epoch "which buckets were touched" lineage comes from the
commit's written-file listing — also no extra pass.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ethereum_etl_airflow_spark.sinks.snapshot_table import (
    SnapshotTable,
    bucket_expr,
    fold_lww,
)

META_COLS = {"op", "seq", "ts", "batch_id", "_seq", "_epoch", "_tombstone", "_bucket"}


def payload_columns(schema: T.StructType) -> list[str]:
    """Logical payload columns of a change batch (doc_id + data cols)."""
    return [f.name for f in schema.fields if f.name not in META_COLS]


def apply_changes(
    table: SnapshotTable,
    batch_df: DataFrame,
    app_id: str,
    epoch: int,
    verify: bool = True,
    fold_batch: bool = False,
    feed_bucketed: bool = False,
    properties: dict | None = None,
) -> dict | None:
    """Apply one change batch; returns lineage dict, or None if the
    epoch was already committed (fenced replay — exactly-once).

    ``properties`` (optional) merges extra snapshot properties into the
    SAME atomic commit as the data — the hook table statistics ride on
    (operators/table_stats.py): a crash after the commit is fenced on
    replay, so a property update paired with its batch is applied
    exactly once."""
    t0 = time.time()
    if epoch <= table.last_epoch(app_id):
        return None

    pay_cols = payload_columns(batch_df.schema)
    data_cols = [c for c in pay_cols if c != "doc_id"]

    obs_cols = [
        F.count(F.lit(1)).alias("events_in"),
        F.min("seq").alias("min_seq"),
        F.max("seq").alias("max_seq"),
        F.count_if(F.col("op") == "D").alias("deletes_in"),
    ]
    has_ts = "ts" in batch_df.columns
    if has_ts:
        # freshness gauge (reference: *_have_latest.sql lag checks)
        obs_cols.append(F.max("ts").alias("max_event_ts"))
    obs_in = Observation(f"cdc_in_{epoch}")
    batch_df = batch_df.observe(obs_in, *obs_cols)

    # schema evolution: union of target schema and the batch's payload
    # schema (added nullable columns, int->long widening)
    src = batch_df.select(
        "doc_id",
        F.col("seq").cast("long").alias("_seq"),
        F.lit(epoch).cast("long").alias("_epoch"),
        (F.col("op") == "D").alias("_tombstone"),
        *data_cols,
    )
    old_schema = table.schema()
    new_schema = SnapshotTable._evolve_schema(old_schema, src.schema)

    typed = src.select(
        "doc_id",
        *[
            F.col(c).cast(_field_type(new_schema, c)).alias(c)
            for c in ["_seq", "_epoch", "_tombstone", *data_cols]
        ],
    )
    # LSM append discipline: by default the batch is written UNFOLDED —
    # the read/compaction-side fold already resolves duplicates and
    # out-of-order updates, so the write path needs exactly ONE shuffle
    # (the _bucket repartition inside commit). fold_batch=True adds an
    # in-batch LWW fold (hash agg with map-side combine) first — worth
    # it only when a batch carries many updates per key, shrinking the
    # delta at the cost of a second shuffle.
    if fold_batch:
        typed = fold_lww(typed)
    delta = typed.withColumn(
        "_bucket", bucket_expr(F.col("doc_id"), table.num_buckets)
    )

    # threshold compaction: buckets already holding >= compact_files - 1
    # files get folded (existing ∪ delta) into one file in this commit
    counts = table.file_counts()
    compact_set = {b for b, c in counts.items() if c + 1 >= table.compact_files}

    if compact_set:
        compact_list = sorted(compact_set)
        if SnapshotTable._live_delete_layers(table.snapshot(), compact_list):
            # pending merge-on-read delete layers on these buckets: fold
            # through the layer-aware path (read_raw materializes the
            # masks); the commit's replace then clears the layers —
            # folding raw files here would silently drop the deletes
            existing = table.read_raw(compact_list)
        else:
            existing = table.read_files(compact_list)
        full = fold_lww(
            existing.unionByName(
                delta.where(F.col("_bucket").isin(compact_list)).drop("_bucket"),
                allowMissingColumns=True,
            )
        ).withColumn("_bucket", bucket_expr(F.col("doc_id"), table.num_buckets))
        out = delta.where(~F.col("_bucket").isin(compact_list)).unionByName(
            full, allowMissingColumns=True
        )
    else:
        out = delta

    if verify:
        out = check_invariants(out)

    obs_out = Observation(f"cdc_out_{epoch}")
    out = out.observe(
        obs_out,
        F.count(F.lit(1)).alias("rows_out"),
        F.count_if(F.col("_tombstone")).alias("tombstones_out"),
    )

    # pre-bucketed feed (key-partitioned Kafka topic shape): the batch's
    # partitioning already groups buckets -> zero-shuffle ingest. A
    # compaction commit mixes in groupBy output, which is doc_id- not
    # bucket-partitioned, so those (rare, amortized) commits realign.
    align = not (feed_bucketed and not compact_set and not fold_batch)
    snap = table.commit(
        out,
        replace_buckets=compact_set,
        app_id=app_id,
        epoch=epoch,
        new_schema=new_schema,
        # manifest-side marker (the full metrics lineage below resolves
        # only after observations and is returned to the caller): CDF
        # stream readers use op + compacted_buckets to tell delta rows
        # from compaction rewrites inside the same commit
        lineage={
            "op": "cdc_apply",
            "epoch": epoch,
            "compacted_buckets": sorted(compact_set),
        },
        align_buckets=align,
        properties=properties,
    )

    wall = time.time() - t0
    m_in = _obs_get(
        obs_in,
        {"events_in": 0, "min_seq": None, "max_seq": None, "deletes_in": 0, "max_event_ts": None},
    )
    m_out = _obs_get(obs_out, {"rows_out": 0, "tombstones_out": 0})
    max_ts = m_in.get("max_event_ts")
    lineage = {
        "app_id": app_id,
        "epoch": epoch,
        "snapshot_version": snap["version"],
        "events_in": m_in["events_in"],
        "deletes_in": m_in["deletes_in"],
        "offset_range": [m_in["min_seq"], m_in["max_seq"]],
        "touched_buckets": len(snap.get("commit_buckets", [])),
        # per-partition lineage (north rule): rows this batch landed in
        # each hash bucket, from the commit's parquet footers
        "bucket_rows_written": snap.get("bucket_rows_written", {}),
        "compacted_buckets": len(compact_set),
        "rows_out": m_out["rows_out"],
        "tombstones_out": m_out["tombstones_out"],
        "wall_sec": round(wall, 4),
        "events_per_sec": round(m_in["events_in"] / wall, 2) if wall > 0 else None,
        "event_time_lag_sec": (
            round(time.time() - _utc_epoch(max_ts), 1) if max_ts is not None else None
        ),
    }
    return lineage


def _utc_epoch(ts: datetime) -> float:
    """Epoch seconds for a timestamp collected from a UTC-pinned Spark
    session. Spark returns naive datetimes; naive ``.timestamp()`` would
    reinterpret them in the host's local timezone, skewing the lag by
    the UTC offset on any non-UTC host — pin UTC explicitly."""
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    return ts.timestamp()


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


def _field_type(schema: T.StructType, name: str) -> T.DataType:
    for f in schema.fields:
        if f.name == name:
            return f.dataType
    raise KeyError(name)


def check_invariants(out: DataFrame) -> DataFrame:
    """Per-batch data-quality guard (reference: verify/sqls/*.sql run
    after every load, build_load_dag.py:220-234): every surviving row
    must satisfy n_tok == size(tokens). Expressed as a fail-fast
    column so it rides the write job — no extra pass."""
    cols = set(out.columns)
    if {"tokens", "n_tok"} <= cols:
        violation = F.col("n_tok").isNotNull() & (
            F.col("n_tok").cast("long") != F.size("tokens").cast("long")
        )
        out = out.withColumn(
            "n_tok",
            F.when(
                violation,
                F.raise_error(F.concat(F.lit("invariant violated: n_tok != size(tokens) for doc_id="), F.col("doc_id"))),
            ).otherwise(F.col("n_tok")),
        )
    return out
