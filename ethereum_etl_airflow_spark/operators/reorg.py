"""Chain-reorg rewind: bucket-scoped state rollback + fence reset, as
one atomic commit.

The reference corrects a bad day the blunt way: re-export the block
range and delete-insert the whole date partition (``merge_blocks.sql``
``when not matched by source and date(timestamp)='{{ds}}' then
delete``, plus the amend DAG's override seeds). The CDC engine's
analogue is a *reorg*: the source chain abandons blocks above height S,
so every change event with ``seq > S`` the table already applied is
invalid, and corrected events for the same range will arrive. LWW
cannot out-bid the invalid rows (their ``_seq`` is by definition the
highest for their keys), so the fix is physical, not logical:

* find the snapshot ``v`` that holds the state as of the last valid
  batch (the ingest app's epoch fence property at ``v`` ≤ the rewind
  epoch);
* collect the buckets touched by every later commit (manifest lineage
  — O(commits), no data read);
* commit the byte-identical file contents those buckets had AT ``v``
  as a ``replace_buckets`` rewrite, with the ingest app's epoch fence
  moved BACK to the rewind epoch in the same atomic commit.

After the rewind, re-running the tailer over the corrected feed
re-applies batches ``k+1..`` through the normal exactly-once path (the
fence was reset transactionally with the data). The rewind itself is a
recorded commit — time travel across the reorg still works, nothing is
orphaned, and unaffected buckets keep their files untouched.

Caveat (documented, matching the engine's single-writer main path): a
rewind reverts ALL commits above ``v`` in the affected buckets,
including any interleaved from other app_ids — the tailer owns main.

Reference parity: merge_blocks.sql partition-scoped delete-insert;
ethereum_amend_dag.py correction flow; SURVEY §2.7 M1 idempotent
overwrite + M2 upsert.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable, bucket_expr


def rewind_to_epoch(table: SnapshotTable, app_id: str, epoch: int) -> dict | None:
    """Rewind ``table`` to its state as of ``app_id``'s batch ``epoch``
    and reset the app's fence to it, atomically. Returns commit info,
    or None when the table is already at (or before) that epoch.

    Raises ``ValueError`` when no retained snapshot carries a fence
    ≤ ``epoch`` for the app (the rewind base has been expired — at that
    point only a full re-bootstrap can recover).
    """
    head_v = table.current_version()
    if head_v < 0 or table.last_epoch(app_id) <= epoch:
        return None

    key = f"last_epoch:{app_id}"
    base_v = None
    for v in range(head_v, -1, -1):
        try:
            snap = table.snapshot(v)
        except FileNotFoundError:
            break  # older snapshots expired
        if int(snap["properties"].get(key, -1)) <= epoch:
            base_v = v
            break
    if base_v is None:
        raise ValueError(
            f"no retained snapshot at or before epoch {epoch} for {app_id!r}; "
            "rewind base expired — re-bootstrap required"
        )

    base = table.snapshot(base_v)
    head = table.snapshot(head_v)
    # bump the app's STREAM GENERATION in the same atomic commit: the
    # file-source checkpoint of run_stream remembers seen paths, so
    # corrected batch dirs that reuse orphaned paths would be silently
    # skipped — the generation counter makes run_stream rotate to a
    # fresh checkpoint subdir + fence namespace automatically (the LWW
    # fold keeps the forced re-read idempotent)
    gen_key = f"stream_gen:{app_id}"
    gen_bump = {gen_key: int(head["properties"].get(gen_key, 0)) + 1}
    if base.get("num_buckets") != head.get("num_buckets"):
        # a rebucket happened above the base: bucket ids are
        # layout-relative, so revert every bucket (full replace)
        affected = set(range(head["num_buckets"]))
    else:
        affected: set[int] = set()
        for v in range(base_v + 1, head_v + 1):
            affected.update(table.snapshot(v).get("commit_buckets", []))
    if not affected:
        # later commits wrote no data (property-only) — just reset the fence
        empty = table.read_files(buckets=[])  # 0 rows, head schema
        out = empty.withColumn("_bucket", F.lit(0).cast("int"))
        snap = table.commit(
            out.limit(0),
            replace_buckets=set(),
            app_id=app_id,
            epoch=epoch,
            properties=gen_bump,
            lineage={"op": "reorg_rewind", "base_version": base_v, "buckets": 0},
        )
        return {"base_version": base_v, "buckets_reverted": 0, "version": snap["version"]}

    # byte-identical pre-reorg content of the affected buckets: the raw
    # file rows at the base version, full LWW history included — the
    # replace commit swaps the buckets' file lists back in one shot
    restored = table.read_files(buckets=sorted(affected), version=base_v)
    out = restored.withColumn(
        "_bucket", bucket_expr(F.col("doc_id"), head["num_buckets"])
    )
    snap = table.commit(
        out,
        replace_buckets=affected,
        app_id=app_id,
        epoch=epoch,
        properties=gen_bump,
        lineage={
            "op": "reorg_rewind",
            "base_version": base_v,
            "head_version": head_v,
            "buckets": len(affected),
        },
    )
    return {
        "base_version": base_v,
        "buckets_reverted": len(affected),
        "version": snap["version"],
    }
