"""Incrementally-maintained secondary index over a CDC target table.

The reference serves "find rows by value" via 4,097 per-selector shard
tables plus 3,999-way hash-partitioned by-topic/by-selector tables
(``build_partition_dag.py:112-146``, ``parse_table_definition_logic.py:
339-346``) — materialized inverted access paths over the raw tables.
This operator is the engine-native generalization: an index
SnapshotTable mapping ``column value -> referencing doc_ids``,
maintained INCREMENTALLY from the target's snapshot diffs (the
DynamoDB-GSI / Phoenix-secondary-index pattern):

* index rows are keyed ``value <sep> doc_id`` but **hash-bucketed by
  value**, so an index lookup prunes to one bucket at the manifest
  level — O(files-per-bucket), independent of index size;
* ``refresh()`` diffs the target between the index's last-seen version
  and the current one, touching only the buckets the commits touched
  (same machinery as ``operators/rollup``): value changes tombstone
  the old index row and insert the new one; doc deletes tombstone;
* exactly-once via the target-version epoch fence; an expired diff
  base falls back to a full rebuild;
* index rows fold LWW like any SnapshotTable, so replays and races
  converge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable, bucket_expr

#: key separator — unit separator, not expected inside values
SEP = "\x1f"


class SecondaryIndex:
    """``value -> doc_ids`` inverted index for one column of a target."""

    def __init__(self, target: SnapshotTable, root: str, column: str, num_buckets: int = 16):
        self.target = target
        self.column = column
        self.index = SnapshotTable(target.spark, root, num_buckets=num_buckets)
        self._app = f"index:{column}"

    def last_target_version(self) -> int:
        return self.index.last_epoch(self._app)

    # ------------------------------------------------------------- refresh

    def _live(self, df: DataFrame) -> DataFrame:
        live = df.where(~F.coalesce(F.col("_tombstone"), F.lit(False)))
        return live.select(
            F.col("doc_id").alias("ref_doc_id"),
            F.col(self.column).cast("string").alias("value"),
        ).where(F.col("value").isNotNull())

    def refresh(self) -> dict | None:
        """Advance the index to the target's current version. Returns
        commit info or None when already current."""
        from_v = self.last_target_version()
        to_v = self.target.current_version()
        if to_v <= from_v:
            return None
        try:
            touched: set[int] = set()
            for v in range(from_v + 1, to_v + 1):
                touched.update(self.target.snapshot(v).get("commit_buckets", []))
            buckets: list[int] | None = sorted(touched)
            # bucket ids are layout-relative: a rebucket inside the
            # range invalidates pruning (old-layout buckets would be
            # misread) -> full-scan diff (ADVICE r2)
            if from_v >= 0 and self.target.snapshot(from_v).get(
                "num_buckets"
            ) != self.target.snapshot(to_v).get("num_buckets"):
                buckets = None
            old = (
                self._live(self.target.read_raw(buckets, version=from_v))
                if from_v >= 0
                else None
            )
        except FileNotFoundError:
            # diff base expired by retention -> full rebuild
            buckets, old = None, None
        new = self._live(self.target.read_raw(buckets, version=to_v))

        if old is None:
            delta = new.select("ref_doc_id", "value", F.lit(False).alias("_tombstone"))
            replace_all = True
        else:
            o = old.alias("o")
            n = new.alias("n")
            joined = o.join(n, F.col("o.ref_doc_id") == F.col("n.ref_doc_id"), "full_outer")
            # old value gone or changed -> tombstone; new value appeared
            # or changed -> insert. Unchanged rows emit nothing.
            drops = joined.where(
                F.col("o.value").isNotNull()
                & (F.col("n.value").isNull() | (F.col("n.value") != F.col("o.value")))
            ).select(
                F.col("o.ref_doc_id").alias("ref_doc_id"),
                F.col("o.value").alias("value"),
                F.lit(True).alias("_tombstone"),
            )
            adds = joined.where(
                F.col("n.value").isNotNull()
                & (F.col("o.value").isNull() | (F.col("o.value") != F.col("n.value")))
            ).select(
                F.col("n.ref_doc_id").alias("ref_doc_id"),
                F.col("n.value").alias("value"),
                F.lit(False).alias("_tombstone"),
            )
            delta = drops.unionByName(adds)
            replace_all = False

        out = delta.select(
            F.concat(F.col("value"), F.lit(SEP), F.col("ref_doc_id")).alias("doc_id"),
            F.lit(to_v).cast("long").alias("_seq"),
            F.lit(to_v).cast("long").alias("_epoch"),
            "_tombstone",
            "value",
            "ref_doc_id",
        ).withColumn(
            # bucket by VALUE (not the composite key): one lookup = one bucket
            "_bucket",
            bucket_expr(F.col("value"), self.index.num_buckets),
        )
        snap = self.index.commit(
            out,
            replace_buckets=set(range(self.index.num_buckets)) if replace_all else set(),
            app_id=self._app,
            epoch=to_v,
            new_schema=out.drop("_bucket").schema,
            lineage={"op": "index_refresh", "from_version": from_v, "to_version": to_v},
        )
        return {"from_version": from_v, "to_version": to_v, "index_version": snap["version"]}

    # -------------------------------------------------------------- lookup

    def lookup(self, value: str) -> DataFrame:
        """doc_ids currently carrying ``value`` — pruned to the value's
        single hash bucket at the manifest level before any file read.
        The bucket is computed DRIVER-SIDE (portable XXH64, bit-equal to
        ``bucket_expr`` — test_hashing_parity), so planning the lookup
        launches no Spark job."""
        from ethereum_etl_airflow_spark.functions.hashing import bucket_of

        b = bucket_of(value, self.index.num_buckets)
        rows = self.index.read(buckets=[b]).where(F.col("value") == value)
        return rows.select("ref_doc_id")
