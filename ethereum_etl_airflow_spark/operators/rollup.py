"""Incrementally-maintained aggregates (materialized rollups) over the
CDC table, via snapshot diff.

The reference maintains derived tables per load (enrich stage joins +
the balances ledger recomputed from scratch or snapshot+delta,
``build_partition_dag.py:157-220`` J5). A CDC engine should maintain
downstream aggregates WITHOUT rescanning the table: this operator
diffs two snapshot versions of the target table and folds the
difference into a keyed stats table.

    delta(group) = sum over changed docs of (new contribution - old
                   contribution)

Only the buckets the commit touched (``snapshot['commit_buckets']``)
are read — at 10^10 rows the diff cost is O(changed buckets), not
O(table). Old state comes from snapshot time travel
(``read_raw(version=...)``), so maintenance can run AFTER the apply
commit, asynchronously, and is exactly-once via the same epoch fence
(the stats table fences on the target snapshot version).

The stats table is itself a SnapshotTable (doc_id = group value), so
it inherits atomic commits, fencing, and time travel. Retractions
(deleted/shrunk groups) are additive negatives — the count going to
zero leaves a zero row, filtered by ``read_stats``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable, bucket_expr

#: aggregate spec: group column + (alias, contribution expression) list
DEFAULT_GROUP = "source"


def _contributions(df: DataFrame, group: str, sign: int) -> DataFrame:
    live = df.where(~F.coalesce(F.col("_tombstone"), F.lit(False)))
    return live.select(
        F.coalesce(F.col(group), F.lit("<null>")).alias("group_key"),
        F.lit(sign).cast("long").alias("d_docs"),
        (F.lit(sign) * F.coalesce(F.col("n_tok").cast("long"), F.lit(0))).alias("d_toks"),
    )


def rollup_delta(
    table: SnapshotTable, from_version: int, to_version: int, group: str = DEFAULT_GROUP
) -> DataFrame:
    """Per-group (delta_docs, delta_tokens) between two snapshots,
    scanning only the buckets the newer commits touched."""
    touched: set[int] = set()
    try:
        for v in range(from_version + 1, to_version + 1):
            touched.update(table.snapshot(v).get("commit_buckets", []))
        buckets = sorted(touched)
    except FileNotFoundError:
        # an intermediate snapshot was expired — fall back to all live
        # buckets (correct, just not bucket-pruned)
        buckets = [int(b) for b in table.snapshot(to_version)["bucket_files"]]
    old = table.read_raw(buckets, version=from_version) if from_version >= 0 else None
    new = table.read_raw(buckets, version=to_version)
    contrib = _contributions(new, group, +1)
    if old is not None and group in old.columns:
        contrib = contrib.unionByName(_contributions(old, group, -1))
    return (
        contrib.groupBy("group_key")
        .agg(F.sum("d_docs").alias("d_docs"), F.sum("d_toks").alias("d_toks"))
        .where((F.col("d_docs") != 0) | (F.col("d_toks") != 0))
    )


class IncrementalRollup:
    """Maintains ``group -> (n_docs, n_toks)`` for a CDC target table.

    ``refresh()`` advances the rollup from its last-seen target version
    to the target's current version in one snapshot-diff pass. Fencing:
    the stats table records the target version it reflects, so replays
    and crash-resumes are no-ops (exactly-once)."""

    def __init__(self, target: SnapshotTable, stats_root: str, group: str = DEFAULT_GROUP):
        self.target = target
        self.group = group
        # tiny table: few groups -> few buckets
        self.stats = SnapshotTable(target.spark, stats_root, num_buckets=4, compact_files=4)
        self._app = f"rollup:{group}"

    def last_target_version(self) -> int:
        return self.stats.last_epoch(self._app)

    def _base_snapshot_available(self, version: int) -> bool:
        try:
            self.target.snapshot(version)
            return True
        except FileNotFoundError:
            return False

    def _full_recompute(self, to_v: int) -> DataFrame:
        """Rebuild the stats from the live table at ``to_v`` — the
        fallback when the diff base snapshot was expired by retention
        (retention drops oldest-first, so a missing intermediate implies
        a missing base). Cost is one full scan; correctness is exact."""
        return (
            self.target.read(version=to_v)
            .select(
                F.coalesce(F.col(self.group), F.lit("<null>")).alias("doc_id"),
                F.coalesce(F.col("n_tok").cast("long"), F.lit(0)).alias("_toks"),
            )
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("_toks").alias("n_toks"))
        )

    def refresh(self) -> dict | None:
        """Advance to the target's current version; returns commit info
        or None when already up to date. If the diff base snapshot has
        been expired (``expire_snapshots`` outpaced the rollup cadence),
        falls back to a full recompute instead of crashing — the rollup
        always catches up."""
        from_v = self.last_target_version()
        to_v = self.target.current_version()
        if to_v <= from_v:
            return None
        if from_v >= 0 and not self._base_snapshot_available(from_v):
            merged = self._full_recompute(to_v)
        else:
            delta = rollup_delta(self.target, from_v, to_v, self.group)
            cur = self.read_stats().select("doc_id", "n_docs", "n_toks")
            merged = (
                delta.select(
                    F.col("group_key").alias("doc_id"),
                    F.col("d_docs"),
                    F.col("d_toks"),
                )
                .join(cur, "doc_id", "full_outer")
                .select(
                    "doc_id",
                    (F.coalesce(F.col("n_docs"), F.lit(0)) + F.coalesce(F.col("d_docs"), F.lit(0))).alias("n_docs"),
                    (F.coalesce(F.col("n_toks"), F.lit(0)) + F.coalesce(F.col("d_toks"), F.lit(0))).alias("n_toks"),
                )
            )
        out = merged.select(
            "doc_id",
            F.lit(to_v).cast("long").alias("_seq"),
            F.lit(to_v).cast("long").alias("_epoch"),
            F.lit(False).alias("_tombstone"),
            "n_docs",
            "n_toks",
        ).withColumn("_bucket", bucket_expr(F.col("doc_id"), self.stats.num_buckets))
        # the stats table is tiny: rewrite all its buckets (compaction
        # every commit) — keyed-LWW rows with seq = target version
        all_buckets = set(range(self.stats.num_buckets))
        snap = self.stats.commit(
            out,
            replace_buckets=all_buckets,
            app_id=self._app,
            epoch=to_v,
            new_schema=out.drop("_bucket").schema,
            lineage={"op": "rollup_refresh", "from_version": from_v, "to_version": to_v},
        )
        return {"from_version": from_v, "to_version": to_v, "stats_version": snap["version"]}

    def read_stats(self) -> DataFrame:
        df = self.stats.read()
        if "n_docs" not in df.columns:
            return self.target.spark.createDataFrame(
                [], "doc_id string, n_docs long, n_toks long"
            )
        return df.where(F.col("n_docs") > 0).select("doc_id", "n_docs", "n_toks")