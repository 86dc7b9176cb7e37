"""Incremental view maintenance for a two-table equi-join: a
materialized ``L ⟕ R ON L[fk] = R.doc_id`` kept current from BOTH
upstreams' change-data feeds.

``IncrementalAggView`` maintains a GROUP BY; this maintains the other
workhorse view shape — the denormalizing join (the reference
materializes exactly this: every enrich table is fact ⋈ blocks
denormalized to avoid re-joining at query time,
dags/resources/stages/enrich/sqls/transactions.sql:27-29, refreshed
incrementally per day). The delta rules are Gupta–Mumick's for
joins, specialized to a foreign-key join (R's ``doc_id`` is its
primary key, so each L row matches ≤ 1 R row and the view is keyed
by L's ``doc_id``):

    Δview = recompute( keys(ΔL)  ∪  { l.doc_id : l.fk ∈ keys(ΔR) } )

i.e. the AFFECTED SET is L rows that changed plus L rows referencing
a changed R row; those rows are re-joined against the CURRENT R
state and upserted (vanished L rows become tombstones). This
"affected-set recompute" form is preferred over the three-term
symbolic delta (ΔL⋈R ∪ L⋈ΔR ∪ ΔL⋈ΔR) because the view is keyed —
an upsert per affected key subsumes all three terms and needs no
duplicate bookkeeping.

Cost per cycle: O(|ΔL| + |ΔR| + |L rows referencing ΔR keys|) reads
via CDF bucket pruning, plus ONE pass over live L to find the
fk-referencing rows (the reverse lookup). At 100 TB that reverse
lookup is the term to engineer: either bucket L by fk (making the
semi-join shuffle-free and prunable) or maintain a
``SecondaryIndex`` on L.fk (operators/index.py) and read only the
postings buckets for the changed keys — both compose with this
operator unchanged; the semi-join form here is the index-free
baseline. Dimension-side deltas are usually tiny (that is WHY
fact⋈dim views are maintainable at all).

Exactly-once: the view's commit is fenced by a strictly monotone
epoch (lv + rv — each effective cycle advances at least one
component), and the precise (left_version, right_version) cursor
pair rides in the SAME atomic commit as the rows via snapshot
properties, so a crashed cycle replays idempotently and resume is
exact (same discipline as IncrementalAggView / the tailer).

Left-join semantics: a referencing L row whose R partner vanishes
stays in the view with null R payload (the reference's LEFT JOIN
enrichment tolerating dimension misses, SURVEY §2.3 J6).
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

_INTERNAL = ("doc_id", "_seq", "_epoch", "_tombstone", "_bucket")


def _payload(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c not in _INTERNAL]


class IncrementalJoinView:
    """Materialized ``left ⟕ right ON left[fk_col] = right.doc_id``,
    keyed by left's ``doc_id``; right's payload columns appear
    prefixed (default ``r_``)."""

    def __init__(
        self,
        spark: SparkSession,
        left: SnapshotTable,
        right: SnapshotTable,
        root: str,
        fk_col: str,
        num_buckets: int = 8,
        app_id: str = "incr_join",
        right_prefix: str = "r_",
    ):
        self.spark = spark
        self.left = left
        self.right = right
        self.fk_col = fk_col
        self.right_prefix = right_prefix
        self.table = SnapshotTable(spark, root, num_buckets=num_buckets)
        self._app = app_id

    # ------------------------------------------------------------- cursor

    def cursor(self) -> tuple[int, int]:
        """(left_version, right_version) folded into the view — read
        from the view's own snapshot properties (committed atomically
        with the rows), so resume is exact across instances."""
        if not self.table.exists() or self.table.current_version() < 0:
            return (-1, -1)
        cur = self.table.snapshot()["properties"].get("incr_join_cursor")
        if not cur:
            return (-1, -1)
        lv, rv = cur.split(":")
        return (int(lv), int(rv))

    # -------------------------------------------------------------- sides

    def _right_live(self) -> DataFrame:
        r = self.right.read()
        cols = [F.col("doc_id").alias(self.fk_col)] + [
            F.col(c).alias(f"{self.right_prefix}{c}") for c in _payload(r)
        ]
        return r.select(*cols)

    # ------------------------------------------------------------ process

    def process_once(self) -> dict | None:
        """Fold pending changes from either side into the view;
        returns lineage or None when already current."""
        lv0, rv0 = self.cursor()
        lv1 = self.left.current_version()
        rv1 = self.right.current_version()
        if lv1 <= lv0 and rv1 <= rv0:
            return None
        epoch = lv1 + rv1  # strictly monotone: each cycle advances a side
        if self.table.exists() and epoch <= self.table.last_epoch(self._app):
            return None  # fenced replay (crash between commit and caller)
        t0 = time.time()

        l_live = self.left.read()

        # affected set: L keys that changed ∪ L keys referencing a
        # changed R key (bucket-pruned CDF reads on both feeds)
        parts: list[DataFrame] = []
        if lv1 > lv0:
            parts.append(
                table_changes(self.left, lv0, lv1).select("doc_id")
            )
        if rv1 > rv0:
            rkeys = (
                table_changes(self.right, rv0, rv1)
                .select(F.col("doc_id").alias(self.fk_col))
                .distinct()
            )
            # index-free reverse lookup: ONE semi-join pass over live L
            # (scale path: bucket L by fk, or SecondaryIndex postings)
            parts.append(
                l_live.join(F.broadcast(rkeys), self.fk_col, "left_semi").select(
                    "doc_id"
                )
            )
        affected = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        # O(Δ) rows; checkpoint so the upsert and tombstone branches
        # below don't each re-derive the CDF diff subtree
        affected = affected.distinct().localCheckpoint(eager=False)

        upserts = (
            l_live.join(affected, "doc_id", "left_semi")
            .join(self._right_live(), self.fk_col, "left")
        )
        pay_cols = _payload(upserts)
        tombstones = affected.join(l_live, "doc_id", "left_anti").select(
            "doc_id",
            *[
                F.lit(None).cast(upserts.schema[c].dataType).alias(c)
                for c in pay_cols
            ],
        )
        out = (
            upserts.select("doc_id", *pay_cols)
            .withColumn("_alive", F.lit(True))
            .unionByName(tombstones.withColumn("_alive", F.lit(False)))
            .select(
                "doc_id",
                F.lit(epoch).cast("long").alias("_seq"),
                F.lit(epoch).cast("long").alias("_epoch"),
                (~F.col("_alive")).alias("_tombstone"),
                *pay_cols,
            )
            .withColumn(
                "_bucket", bucket_expr(F.col("doc_id"), self.table.num_buckets)
            )
        )
        snap = self.table.commit(
            out,
            replace_buckets=set(),
            app_id=self._app,
            epoch=epoch,
            new_schema=SnapshotTable._evolve_schema(
                self.table.schema(), out.drop("_bucket").schema
            ),
            properties={"incr_join_cursor": f"{lv1}:{rv1}"},
            lineage={
                "op": "incr_join",
                "from": [lv0, rv0],
                "to": [lv1, rv1],
            },
        )
        return {
            "from": (lv0, rv0),
            "to": (lv1, rv1),
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

    def read(self) -> DataFrame:
        """Consumer view: doc_id + left payload + prefixed right
        payload. Empty before the first fold."""
        if not self.table.exists() or self.table.current_version() < 0:
            return self.spark.createDataFrame([], "doc_id string")
        return self.table.read()

    def recompute(self) -> DataFrame:
        """From-scratch join of the live upstream states — the
        equivalence oracle the tests pin the view against."""
        l_live = self.left.read()
        return l_live.select("doc_id", *_payload(l_live)).join(
            self._right_live(), self.fk_col, "left"
        )
