"""Incrementally-maintained aggregate view over the full changelog.

``IncrementalAggView`` keeps ``SELECT key, SUM(val), COUNT(*) GROUP BY
key`` materialized as its own :class:`SnapshotTable`, maintained purely
from the upstream table's change-data-feed in **full changelog mode**
(``operators/changes.table_changes(changelog_mode="full")``): every
cycle folds the pre/post images into a per-group *delta* —

    +val for ``insert`` / ``update_postimage``   (apply the new image)
    -val for ``delete`` / ``update_preimage``    (retract the old one)

— and merges ``new_state = old_state + delta`` for ONLY the affected
groups. This is classical incremental view maintenance (delta rules
for SUM/COUNT aggregates; Gupta & Mumick, "Maintenance of Materialized
Views", IEEE Data Eng. Bull. 1995) running on the engine's own CDF,
i.e. what Materialize / Delta Live Tables / Flink's retract streams do
for a grouped aggregate.

Why this exists in a CDC engine: the reference rebuilds derived
aggregate tables by re-running their SQL over the full base table on
an Airflow cadence (``build_partition_dag.py:157-220`` —
amended-token-balances style rebuilds). At 10^10 accumulated events a
rebuild costs O(table) per cycle; delta maintenance costs O(changes) —
the difference between a nightly batch and a continuously-fresh view.

Scale/exactness properties:

* **O(changes) per cycle** — the changelog is pruned to touched
  buckets upstream; the delta aggregate shuffles only changed rows;
  the read-modify-write reads only the agg-table buckets that hold
  affected groups (bucket pruning via the same portable hash).
* **Exactly-once** — the delta is a pure function of two retained
  upstream snapshots, and the merge commit carries the upstream
  version as its fenced epoch: crash before the commit → identical
  delta recomputed on resume; crash after → fenced replay skips. The
  cursor and the rows it describes are one atomic commit.
* **SUM/COUNT are self-maintainable** under inserts+deletes (no
  rescan, ever). A group whose count reaches zero is tombstoned —
  exactly the retraction a downstream consumer of *this* table's CDF
  would need. MIN/MAX are deliberately not offered: they are not
  self-maintainable under deletes (a delete of the current extremum
  forces a per-group rescan) — callers needing them should use the
  rollup operator's recompute path (operators/rollup.py).
* **Exact arithmetic** — val aggregates as DECIMAL(38,6) (associative,
  partial-agg-order-immune per house float discipline); stored as
  decimal so repeated increments never drift.

The relational twin checked by the DuckDB oracle harness is
``functions/cdclog.cdc_changelog_images`` (the feed) + an ordinary
grouped aggregate; the pytest suite proves the maintained table equals
a from-scratch recompute after arbitrary insert/update/delete mixes,
under crash-replay, and through group birth/death.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.operators.changes import table_changes
from ethereum_etl_airflow_spark.sinks.snapshot_table import (
    SnapshotTable,
    bucket_expr,
)

_POST = ("insert", "update_postimage")


class IncrementalAggView:
    """Materialized ``GROUP BY key_col → (sum_val, cnt)`` over an
    upstream :class:`SnapshotTable`, maintained from its CDF."""

    def __init__(
        self,
        spark: SparkSession,
        upstream: SnapshotTable,
        root: str,
        key_col: str,
        val_col: str,
        num_buckets: int = 8,
        app_id: str = "incr_agg",
    ):
        self.spark = spark
        self.upstream = upstream
        self.key_col = key_col
        self.val_col = val_col
        self.table = SnapshotTable(spark, root, num_buckets=num_buckets)
        self._app = app_id

    # ------------------------------------------------------------- cursor

    def cursor(self) -> int:
        """Last upstream version folded into the view (fenced epoch in
        the view table's own properties — resumes across instances)."""
        return self.table.last_epoch(self._app) if self.table.exists() else -1

    # ------------------------------------------------------------ process

    def _delta(self, from_v: int, to_v: int) -> DataFrame:
        """Per-group (Δsum, Δcount) from the full changelog: post
        images apply, pre images retract. One aggregate over O(changes)
        rows."""
        ch = table_changes(self.upstream, from_v, to_v, changelog_mode="full")
        sign = F.when(F.col("_change_type").isin(*_POST), F.lit(1)).otherwise(
            F.lit(-1)
        )
        return (
            ch.select(
                F.col(self.key_col).cast("string").alias("doc_id"),
                (sign * F.col(self.val_col).cast("decimal(38,6)")).alias("dv"),
                sign.alias("dc"),
            )
            .groupBy("doc_id")
            .agg(
                F.sum("dv").cast("decimal(38,6)").alias("dv"),
                F.sum("dc").cast("long").alias("dc"),
            )
        )

    def process_once(self) -> dict | None:
        """Fold pending upstream changes into the view; returns lineage
        or None when already current."""
        from_v = self.cursor()
        to_v = self.upstream.current_version()
        if to_v <= from_v:
            return None
        t0 = time.time()
        delta = self._delta(from_v, to_v).withColumn(
            "_bucket", bucket_expr(F.col("doc_id"), self.table.num_buckets)
        )

        if self.table.exists() and self.table.current_version() >= 0:
            # read-modify-write restricted to the view buckets that can
            # hold an affected group (bounded by num_buckets — a
            # driver-side scalar list, not a data-path collect)
            touched = sorted(
                r[0] for r in delta.select("_bucket").distinct().collect()
            )
            old = self.table.read(buckets=touched, columns=["sum_val", "cnt"])
            merged = delta.join(old, "doc_id", "left")
        else:
            merged = delta.select(
                "doc_id",
                "dv",
                "dc",
                "_bucket",
                F.lit(None).cast("decimal(38,6)").alias("sum_val"),
                F.lit(None).cast("long").alias("cnt"),
            )

        zero = F.lit(0).cast("decimal(38,6)")
        new_cnt = F.coalesce(F.col("cnt"), F.lit(0)) + F.col("dc")
        out = merged.select(
            "doc_id",
            F.lit(to_v).cast("long").alias("_seq"),
            F.lit(to_v).cast("long").alias("_epoch"),
            # a group retracted to zero members dies: tombstone it so
            # the view's own CDF emits the delete downstream
            (new_cnt <= 0).alias("_tombstone"),
            (F.coalesce(F.col("sum_val"), zero) + F.col("dv"))
            .cast("decimal(38,6)")
            .alias("sum_val"),
            new_cnt.cast("long").alias("cnt"),
            "_bucket",
        )
        snap = self.table.commit(
            out,
            replace_buckets=set(),
            app_id=self._app,
            epoch=to_v,  # upstream cursor, fenced atomically with the rows
            new_schema=SnapshotTable._evolve_schema(
                self.table.schema(), out.drop("_bucket").schema
            ),
            lineage={"op": "incr_agg", "from_version": from_v, "to_version": to_v},
        )
        return {
            "from_version": from_v,
            "to_version": to_v,
            "view_version": snap["version"],
            "wall_sec": round(time.time() - t0, 4),
        }

    def run_until_caught_up(self, max_cycles: int = 1000) -> list[dict]:
        out = []
        for _ in range(max_cycles):
            li = self.process_once()
            if li is None:
                return out
            out.append(li)
        return out

    # -------------------------------------------------------------- read

    _EMPTY = "doc_id string, sum_val decimal(38,6), cnt long"

    def read(self) -> DataFrame:
        """Consumer view: (doc_id=group key, sum_val decimal, cnt).
        Empty before the first upstream commit is folded."""
        if not self.table.exists() or self.table.current_version() < 0:
            return self.spark.createDataFrame([], self._EMPTY)
        return self.table.read().select("doc_id", "sum_val", "cnt")

    def recompute(self) -> DataFrame:
        """From-scratch reference aggregate over the upstream's current
        state — the invariant ``read() == recompute()`` the tests pin."""
        if not self.upstream.exists() or self.upstream.current_version() < 0:
            return self.spark.createDataFrame([], self._EMPTY)
        return (
            self.upstream.read()
            .groupBy(F.col(self.key_col).cast("string").alias("doc_id"))
            .agg(
                F.sum(F.col(self.val_col).cast("decimal(38,6)"))
                .cast("decimal(38,6)")
                .alias("sum_val"),
                F.count("*").alias("cnt"),
            )
        )
