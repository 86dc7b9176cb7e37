"""Incrementally-maintained table statistics (NDV sketch in snapshot
properties).

A CBO (and a capacity planner) wants the approximate number of
distinct keys in a 10^10-row table WITHOUT a full scan. This operator
maintains a HyperLogLog register set (functions/hll.py) inside the
table's snapshot properties: each change batch contributes its 64
registers, MAX-merged with the stored set, and the merged value rides
the SAME atomic commit as the batch data (apply_changes
``properties=`` hook).

Exactly-once by construction, twice over:
1. the property merge is part of the epoch-fenced commit — a replayed
   batch is fenced before the merge is recomputed;
2. even if a batch's registers WERE merged twice, MAX-merge is
   idempotent, so the statistic cannot drift.

Cost: one extra narrow aggregation per batch over the batch only
(never the table), <= 64 rows collected — opt-in, off the default
ingest path so the north-rule throughput metric is unaffected.

Reference parity: the reference maintains table-level row-count
expectations in its verify SQLs (dags/resources/stages/verify); this
is the sublinear distinct-key analogue, kept fresh by the ingest
itself instead of a scheduled full-scan query.

Deletes: a tombstone removes a row but an HLL cannot un-see a key, so
the statistic is "distinct keys EVER ingested" — the right quantity
for dedup-pressure and key-space sizing. (A live-key NDV would need a
full rescan; ``recompute_live`` provides it on demand.)
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from ethereum_etl_airflow_spark.functions.hll import (
    HLL_M,
    batch_registers,
    estimate,
    merge_registers,
)
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable

#: snapshot-property key prefix (one stat per tracked column)
PROP_PREFIX = "stats:hll:"


def stored_registers(table: SnapshotTable, key_col: str = "doc_id") -> list[int]:
    """The register set in the table's current snapshot ([0]*m if the
    statistic has never been written)."""
    raw = table.snapshot()["properties"].get(PROP_PREFIX + key_col)
    return json.loads(raw) if raw else [0] * HLL_M


def props_for_batch(
    table: SnapshotTable, batch_df: DataFrame, key_col: str = "doc_id"
) -> dict:
    """Snapshot-property dict for this batch's commit: the stored
    registers MAX-merged with the batch's. Pass the result straight to
    ``apply_changes(..., properties=...)`` so the merge is atomic with
    the data."""
    merged = merge_registers(
        stored_registers(table, key_col), batch_registers(batch_df, key_col)
    )
    return {PROP_PREFIX + key_col: json.dumps(merged)}


def distinct_estimate(table: SnapshotTable, key_col: str = "doc_id") -> float:
    """Approximate distinct keys ever ingested — O(1), no scan."""
    return estimate(stored_registers(table, key_col))


def recompute_live(table: SnapshotTable, key_col: str = "doc_id") -> float:
    """Estimate over the CURRENT live rows (one folded scan) — the
    on-demand live-key NDV, and the audit for the incremental stat."""
    return estimate(batch_registers(table.read(), key_col))
