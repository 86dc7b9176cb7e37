"""SnapshotTable as a NATIVE exactly-once Structured Streaming sink
(PySpark 4 Python Data Source API, Arrow writer).

``df.writeStream.format("snapshot_table").option("path", root)`` makes
the table a first-class sink — the DSv2 two-phase commit protocol the
north rule's "idempotent Iceberg snapshot commit carrying the batch
epoch" describes, expressed through the public API instead of
``foreachBatch``:

1. **tasks write** (executor, Arrow): each task receives the batch's
   change events as RecordBatches, converts them to storage shape
   (``_seq``/``_epoch``/``_tombstone`` + payload), splits rows by hash
   bucket (the driver-parity XXH64 is evaluated once per UNIQUE key
   per task, not per row — the heavy work: grouping, sorting, parquet
   encode — stays in Arrow), writes one doc_id-sorted parquet file per
   bucket under the table root, and returns the file list as its
   commit message. The batch epoch comes from the task-local property
   ``streaming.sql.batchId``.
2. **driver publishes** (no SparkSession needed): ``commit(messages,
   batchId)`` fences on ``last_epoch`` — a replayed batch after a
   crash-between-write-and-commit is SKIPPED and its re-written files
   become orphans for ``expire_snapshots`` — then assembles ONE atomic
   manifest via ``SnapshotTable.commit(prewritten=...)`` (footer stats
   included; per-file _seq skip index intact). ``abort()`` removes the
   staged files.

The input contract matches ``operators/cdc.apply_changes`` batches:
``op`` (I/U/D), ``doc_id``, monotone ``seq``, payload columns.
Downstream reads fold with the same LWW semantics as every other
write path, so a stream written through this sink and a replay through
the tailer converge to the identical table state.

Scale note: rows land pre-bucketed per task, so one micro-batch
produces O(tasks x touched-buckets) delta files; threshold compaction
amortizes them exactly as it does for the tailer's aligned commits.
For the fewest files, repartition the stream by
``pmod(xxhash64(doc_id), B)`` upstream — each task then holds whole
buckets (the Kafka key-partitioned topic shape).

Register with :func:`register_table_sink`, then::

    stream.writeStream.format("snapshot_table")
        .option("path", root).option("app_id", "ingest")
        .option("num_buckets", 8)
        .option("checkpointLocation", ckpt).start()
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

#: change-batch bookkeeping columns that never land as payload
_META = ("op", "seq", "ts", "batch_id")


class _FilesMessage(WriterCommitMessage):
    def __init__(self, files: dict[str, list[str]], rows: int):
        self.files = files
        self.rows = rows


def _storage_schema(batch_schema: T.StructType) -> T.StructType:
    """Writer-schema -> table storage schema (the apply_changes shape)."""
    fields = [T.StructField("doc_id", T.StringType(), False)]
    fields += [
        T.StructField("_seq", T.LongType(), True),
        T.StructField("_epoch", T.LongType(), True),
        T.StructField("_tombstone", T.BooleanType(), True),
    ]
    for f in batch_schema.fields:
        if f.name not in ("doc_id", *_META):
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


def _manifest_num_buckets(root: str) -> int | None:
    """Fan-out of an existing table at ``root`` (None when absent) —
    read driver-side from the manifest JSON, no Spark session."""
    import json

    try:
        with open(os.path.join(root, "_meta", "VERSION")) as f:
            v = int(f.read().strip())
        with open(
            os.path.join(root, "_meta", f"snapshot-{v:012d}.json")
        ) as f:
            nb = json.load(f).get("num_buckets")
        return int(nb) if nb else None
    except (OSError, ValueError):
        return None


class SnapshotTableStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, options: dict, schema: T.StructType):
        self.root = options["path"]
        self.app_id = options.get("app_id", "stream_sink")
        self.batch_schema = schema
        # an existing table's bucket fan-out is owned by its manifest
        # (it may differ from the option, e.g. after a rebucket) —
        # executors MUST bucket rows with the manifest's value or
        # bucket-pruned reads silently miss rows. Resolve here on the
        # driver, before the writer pickles to executors; an explicit
        # mismatching option is an error, not a silent override.
        opt_nb = options.get("num_buckets")
        manifest_nb = _manifest_num_buckets(self.root)
        if manifest_nb is not None:
            if opt_nb is not None and int(opt_nb) != manifest_nb:
                raise ValueError(
                    f"num_buckets option ({opt_nb}) conflicts with the "
                    f"existing table's manifest fan-out ({manifest_nb}) "
                    f"at {self.root}; drop the option or rebucket first"
                )
            self.num_buckets = manifest_nb
        else:
            self.num_buckets = int(opt_nb) if opt_nb is not None else 8

    # ---------------------------------------------------------- executor

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        from ethereum_etl_airflow_spark.functions.hashing import bucket_of

        tc = TaskContext.get()
        epoch = int(tc.getLocalProperty("streaming.sql.batchId"))
        batches = list(iterator)
        if not batches:
            return _FilesMessage({}, 0)
        tbl = pa.Table.from_batches(batches)
        n = tbl.num_rows
        payload = [
            name
            for name in tbl.column_names
            if name not in ("doc_id", *_META)
        ]
        doc = pc.cast(tbl["doc_id"], pa.string())
        out = pa.table(
            {
                "doc_id": doc,
                "_seq": pc.cast(tbl["seq"], pa.int64()),
                "_epoch": pa.array([epoch] * n, type=pa.int64()),
                "_tombstone": pc.equal(tbl["op"], "D"),
                **{name: tbl[name] for name in payload},
            }
        )
        # hash once per UNIQUE key (driver-parity XXH64); row fan-out
        # to buckets happens vectorized via dictionary take
        uniq = pc.unique(doc).to_pylist()
        lut = {u: bucket_of(u, self.num_buckets) for u in uniq}
        buckets = pa.array((lut[d] for d in doc.to_pylist()), type=pa.int32())
        rel_dir = os.path.join(
            "data", f"sink-e{epoch}-t{tc.partitionId()}-{uuid.uuid4().hex[:8]}"
        )
        os.makedirs(os.path.join(self.root, rel_dir), exist_ok=True)
        files: dict[str, list[str]] = {}
        for b in sorted(set(lut.values())):
            part = out.filter(pc.equal(buckets, b)).sort_by("doc_id")
            rel = os.path.join(rel_dir, f"bucket-{b}.parquet")
            pq.write_table(part, os.path.join(self.root, rel))
            files.setdefault(str(b), []).append(rel)
        return _FilesMessage(files, n)

    # ------------------------------------------------------------ driver

    def _table(self):
        from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable

        # the prewritten-commit path never touches Spark — the sink
        # callback runs without a session handle
        return SnapshotTable(None, self.root, num_buckets=self.num_buckets)

    def commit(self, messages, batchId: int) -> None:
        # re-validate the fan-out against the CURRENT manifest: a
        # rebucket landing mid-stream would otherwise let this batch's
        # files (hashed with the old fan-out on executors) commit under
        # wrong bucket ids and vanish from pruned reads — fail the
        # batch loudly instead; a restarted stream re-resolves in
        # __init__ and re-buckets correctly
        current = _manifest_num_buckets(self.root)
        if current is not None and current != self.num_buckets:
            raise RuntimeError(
                f"table {self.root} was rebucketed to {current} while the "
                f"stream was writing {self.num_buckets}-bucket files — "
                "restart the stream to adopt the new fan-out"
            )
        table = self._table()
        merged: dict[str, list[str]] = {}
        rows = 0
        for m in messages:
            if m is None:
                continue
            rows += m.rows
            for b, fs in m.files.items():
                merged.setdefault(b, []).extend(fs)
        if batchId <= table.last_epoch(self.app_id):
            return  # replayed epoch: fenced; re-staged files become orphans
        storage = _storage_schema(self.batch_schema)
        new_schema = table._evolve_schema(table.schema(), storage)
        table.commit(
            None,
            replace_buckets=set(),
            app_id=self.app_id,
            epoch=batchId,
            new_schema=new_schema,
            prewritten=merged,
            lineage={
                "op": "cdc_apply",
                "epoch": batchId,
                "compacted_buckets": [],
                "writer": "snapshot_table_sink",
                "events_in": rows,
            },
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m is None:
                continue
            for fs in m.files.values():
                for rel in fs:
                    try:
                        os.remove(os.path.join(self.root, rel))
                    except OSError:
                        pass


class SnapshotTableDataSource(DataSource):
    """``format("snapshot_table")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        return SnapshotTableStreamWriter(dict(self.options), schema)


def register_table_sink(spark: SparkSession) -> None:
    spark.dataSource.register(SnapshotTableDataSource)
