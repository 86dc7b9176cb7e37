"""Incrementally-maintained IVF ANN index over a CDC target table.

The reference materializes inverted access paths over its raw tables
(per-selector shard tables, hash-partitioned by-topic tables —
``build_partition_dag.py:112-146``) and keeps them fresh by
re-deriving from table diffs. ``SecondaryIndex`` generalizes that to
value lookups; this operator generalizes it to VECTOR search: an
index SnapshotTable mapping each document to its IVF cluster, with
the vector payload colocated, maintained incrementally from the
target's snapshot diffs.

* ``build()`` trains the coarse quantizer on the current table state
  (deterministic seeds -> one exact-int Lloyd step, the same
  ``functions/ivf`` math as the oracle-checked query) and FREEZES the
  centroids into the index table's properties — committed atomically
  with the assignments, so readers always see a centroid set
  consistent with every assignment row.
* ``refresh()`` diffs the target between the index's last-seen
  version and now (bucket-pruned, rebucket-safe, exactly-once via
  the target-version epoch fence — the ``SecondaryIndex`` /
  ``rollup`` machinery) and re-assigns ONLY changed vectors against
  the frozen centroids; deletes tombstone. Cost is O(changed rows),
  never a re-train. Centroid drift under heavy churn is the classic
  IVF operational tradeoff: ``build()`` again when recall decays —
  the index records ``assignments_since_build`` lineage to decide.
* ``search(vec, k)`` scores the frozen centroids DRIVER-side (K
  floats — no Spark job to plan), then reads only the probed
  clusters' buckets: cluster IS the bucket key, so the manifest
  prunes to P buckets regardless of index size, and the exact
  ranking touches ~P/K of the vectors.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.ivf import (
    K_IVF,
    P_PROBE,
    _argmax_cluster,
    assign_ivf,
)
from ethereum_etl_airflow_spark.functions.veclib import (
    SCALE,
    _dot,
    _norm_sq,
    int_vec,
)
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable


class IvfIndex:
    """doc -> IVF cluster assignment table with colocated vectors."""

    def __init__(self, target: SnapshotTable, root: str, emb_col: str = "embedding"):
        self.target = target
        self.emb_col = emb_col
        self.index = SnapshotTable(target.spark, root, num_buckets=K_IVF)
        self._app = f"ivf:{emb_col}"

    def last_target_version(self) -> int:
        return self.index.last_epoch(self._app)

    def centroids(self) -> list[tuple[int, list[int]]]:
        import json

        raw = self.index.snapshot()["properties"].get("ivf_centroids")
        if raw is None:
            raise ValueError("index not built")
        return [(int(c), [int(x) for x in v]) for c, v in json.loads(raw)]

    # ------------------------------------------------------------ vectors

    def _live_vectors(self, df: DataFrame) -> DataFrame:
        live = df.where(~F.coalesce(F.col("_tombstone"), F.lit(False)))
        return live.select(
            "doc_id", int_vec(F.col(self.emb_col)).alias("iv")
        ).where(F.col("iv").isNotNull())

    def _rows(self, assigned: DataFrame, to_v: int, tombstone=None) -> DataFrame:
        out = assigned.select(
            "doc_id",
            F.lit(to_v).cast("long").alias("_seq"),
            F.lit(to_v).cast("long").alias("_epoch"),
            (
                F.lit(False) if tombstone is None else F.col("_tombstone")
            ).alias("_tombstone"),
            F.col("cluster").cast("int").alias("cluster"),
            "iv",
            _norm_sq(F.col("iv")).alias("nsq"),
        )
        # cluster IS the bucket: a P-cluster probe reads P buckets
        return out.withColumn("_bucket", F.pmod(F.col("cluster"), F.lit(K_IVF)))

    # -------------------------------------------------------------- build

    def build(self) -> dict:
        """(Re)train the quantizer on the target's current live rows
        and rewrite the whole index in one atomic commit."""
        import json

        to_v = self.target.current_version()
        vecs = self._live_vectors(self.target.read_raw())
        assigned, cents = assign_ivf(self.target.spark, vecs, id_col="doc_id")
        out = self._rows(assigned, to_v)
        snap = self.index.commit(
            out,
            replace_buckets=set(range(K_IVF)),
            app_id=self._app,
            epoch=to_v,
            new_schema=out.drop("_bucket").schema,
            full_replace=self.index.exists(),
            properties={
                "ivf_centroids": json.dumps(cents),
                "ivf_built_at_version": to_v,
                "assignments_since_build": 0,
            },
            lineage={"op": "ivf_build", "target_version": to_v},
        )
        return {"target_version": to_v, "index_version": snap["version"]}

    # ------------------------------------------------------------ refresh

    def refresh(self) -> dict | None:
        """Advance to the target's current version: re-assign changed
        vectors against the FROZEN centroids; None when current."""
        from_v = self.last_target_version()
        to_v = self.target.current_version()
        if to_v <= from_v:
            return None
        cents = self.centroids()
        try:
            touched: set[int] = set()
            for v in range(from_v + 1, to_v + 1):
                touched.update(self.target.snapshot(v).get("commit_buckets", []))
            buckets: list[int] | None = sorted(touched)
            if self.target.snapshot(from_v).get("num_buckets") != self.target.snapshot(
                to_v
            ).get("num_buckets"):
                buckets = None  # rebucket inside the range: full-scan diff
            old = self._live_vectors(self.target.read_raw(buckets, version=from_v))
        except FileNotFoundError:
            # diff base expired by retention: re-assign everything
            # (frozen centroids — this is NOT a retrain)
            buckets, old = None, None
        new = self._live_vectors(self.target.read_raw(buckets, version=to_v))

        if old is None:
            delta = new.withColumn("_tombstone", F.lit(False))
            replace_all = True
        else:
            o, n = old.alias("o"), new.alias("n")
            joined = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
            drops = joined.where(
                F.col("o.iv").isNotNull() & F.col("n.iv").isNull()
            ).select(
                F.col("o.doc_id").alias("doc_id"),
                F.col("o.iv").alias("iv"),
                F.lit(True).alias("_tombstone"),
            )
            changed = joined.where(
                F.col("n.iv").isNotNull()
                & (F.col("o.iv").isNull() | (F.col("o.iv") != F.col("n.iv")))
            ).select(
                F.col("n.doc_id").alias("doc_id"),
                F.col("n.iv").alias("iv"),
                F.lit(False).alias("_tombstone"),
            )
            delta = drops.unionByName(changed)
            replace_all = False

        assigned = delta.withColumn(
            "cluster", _argmax_cluster(F.col("iv"), cents)
        )
        out = self._rows(assigned, to_v, tombstone=True)
        props = self.index.snapshot()["properties"]
        since = int(props.get("assignments_since_build") or 0)
        n_delta = assigned.count()
        snap = self.index.commit(
            out,
            replace_buckets=set(range(K_IVF)) if replace_all else set(),
            app_id=self._app,
            epoch=to_v,
            new_schema=out.drop("_bucket").schema,
            properties={"assignments_since_build": since + n_delta},
            lineage={
                "op": "ivf_refresh",
                "from_version": from_v,
                "to_version": to_v,
                "rows": n_delta,
            },
        )
        return {"from_version": from_v, "to_version": to_v, "rows": n_delta,
                "index_version": snap["version"]}

    # -------------------------------------------------------------- search

    def search(self, embedding: list[float], k: int = 5) -> DataFrame:
        """Exact top-k among the probed clusters' vectors. Probe
        planning is pure driver arithmetic over the K frozen
        centroids; the scan reads only the probed buckets."""
        q_iv = [math.floor(float(x) * SCALE) for x in embedding]
        scored = []
        for cid, vec in self.centroids():
            dot = sum(a * b for a, b in zip(q_iv, vec))
            nsq = sum(x * x for x in vec)
            scored.append((-(float(dot) / math.sqrt(float(nsq))), cid))
        probes = [cid for _, cid in sorted(scored)[:P_PROBE]]
        rows = self.index.read(buckets=probes)
        qcol = F.array(*[F.lit(int(x)).cast("long") for x in q_iv])
        ranked = rows.select(
            "doc_id",
            "cluster",
            _dot(qcol, F.col("iv")).alias("dot_scaled"),
            F.col("nsq"),
        ).withColumn(
            "score",
            F.col("dot_scaled").cast("double")
            / F.sqrt(F.col("nsq").cast("double")),
        )
        return ranked.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
