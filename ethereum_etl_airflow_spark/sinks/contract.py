"""The TableSink seam: the formal contract an exactly-once snapshot
table sink must satisfy.

The engine targets Iceberg (north rule), but this image carries no
Iceberg jar, so :class:`~ethereum_etl_airflow_spark.sinks.
snapshot_table.SnapshotTable` implements the same contract on a plain
filesystem (SURVEY §7.3). This module pins the seam down as a
``Protocol`` so an Iceberg-backed implementation can be dropped in and
proven equivalent by running the SAME test suite
(``tests/test_tablesink_contract.py`` — parametrized over sink
factories) against both:

=====================  =====================================================
contract method        Iceberg equivalent
=====================  =====================================================
``commit``             MERGE INTO + snapshot commit w/ summary properties
``last_epoch``         ``snapshot.summary['last_epoch:<app>']`` fencing
``read / read_raw``    table scan (+ MOR delete-file merge)
``lookup``             metadata-pruned point scan (puffin blooms)
``snapshot / schema``  snapshot + schema-id metadata
``read(version=v)``    ``VERSION AS OF`` time travel
``compact``            ``rewrite_data_files`` maintenance
``expire_snapshots``   ``expire_snapshots`` maintenance
``update_properties``  ``ALTER TABLE SET TBLPROPERTIES``
=====================  =====================================================

The contract's behavioral guarantees (what the test suite asserts):

1. **Atomic versioned commits**: each commit advances ``
   current_version`` by one; readers of version v never observe a
   partial commit.
2. **Epoch fencing**: ``last_epoch(app_id)`` reflects the latest
   committed epoch per writer id, atomically with the rows.
3. **Merge-on-read LWW**: multiple rows per key across commits fold to
   the highest ``(_seq, _epoch)``; tombstoned keys disappear from
   ``read`` but hold their seq against late events.
4. **Schema evolution**: new nullable columns and int->long widening
   apply to ALL rows (old files read through the new schema);
   non-scan-compatible widenings are refused loudly.
5. **Time travel**: retained versions are readable; maintenance
   (compact / expire) never changes the logical state of the snapshots
   it keeps.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame
from pyspark.sql import types as T


@runtime_checkable
class TableSink(Protocol):
    """Structural interface of an exactly-once snapshot table sink."""

    num_buckets: int

    def exists(self) -> bool: ...

    def current_version(self) -> int: ...

    def snapshot(self, version: int | None = None) -> dict: ...

    def schema(self) -> T.StructType | None: ...

    def last_epoch(self, app_id: str) -> int: ...

    def commit(
        self,
        out_df: DataFrame,
        replace_buckets: set[int],
        app_id: str,
        epoch: int,
        **kwargs,
    ) -> dict: ...

    def read(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> DataFrame: ...

    def read_raw(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> DataFrame: ...

    def lookup(self, doc_ids: list[str], version: int | None = None) -> DataFrame: ...

    def compact(self, buckets: list[int] | None = None, **kwargs) -> dict: ...

    def expire_snapshots(self, keep_last: int = 2, ttl_sec: float | None = None) -> int: ...

    def update_properties(self, updates: dict) -> dict: ...
