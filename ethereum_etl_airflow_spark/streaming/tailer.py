"""Change-log tailer: the Structured-Streaming replacement for the
reference's Airflow sensor + load DAG loop.

Two drive modes over the same ``apply_changes`` core:

  * ``run_stream`` — ``readStream`` file source over the feed directory
    (the file source IS the reference's GCSObjectExistenceSensor,
    build_load_dag.py:83-91) with ``foreachBatch`` + Spark checkpoint.
    Exactly-once = Spark checkpoint (offset tracking) + snapshot epoch
    fencing (a batch replayed after crash-recovery is skipped by the
    sink — the Iceberg (app_id, epoch) pattern, SURVEY §2.10).
  * ``replay_batches`` — deterministic batch loop over
    ``feed/batch_id=N`` directories (the reference's daily ``ds``
    cadence). Resume needs no extra state: the table's last committed
    epoch is the checkpoint, so restarting from batch 0 fast-skips
    applied epochs. Handles mid-stream schema evolution (each batch
    directory is read with its own schema).

Every applied batch appends one lineage row (source offset range,
event counts, snapshot version, wall time, events/sec) to an
append-only parquet sink — the reference's load_metadata table
(build_load_dag.py:236-268, S12).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import SparkSession

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable


#: from_json schema for the canonical JSON change envelope (the
#: Debezium/WAL wire shape adapted to the tokenized-sequence payload).
#: doc_id and seq ride at the TOP level so delete envelopes — whose
#: ``after`` payload is absent — still carry their key and ordering;
#: a missing/null ``after`` decodes to null payload columns, which is
#: exactly the tombstone contract apply_changes expects for op='D'.
CHANGE_ENVELOPE_SCHEMA = (
    "op string, doc_id string, seq long, ts timestamp_ntz, "
    "after struct<tokens: array<int>, n_tok: int, source: string>"
)


def envelope_to_changes(df, column: str = "envelope", schema: str = CHANGE_ENVELOPE_SCHEMA):
    """Raw JSON change-envelope column -> canonical change rows.

    Pure JVM ``from_json`` (whole-stage codegen — no Python in the
    ingest hot path); malformed envelopes decode to an all-null row
    (PERMISSIVE), which the quarantine contract check dead-letters
    with reason null_doc_id instead of poisoning the batch. Pass as
    ``ChangeLogTailer(transform=envelope_to_changes)`` to ingest a
    self-describing feed through the unchanged CDC core.

    Parity: the batch-analytics twin (planted-envelope parse + LWW
    fold, oracle-checked) is functions/envelope.py.
    """
    from pyspark.sql import functions as F

    j = df.select(F.from_json(F.col(column), schema).alias("j"))
    return j.select(
        F.col("j.op").alias("op"),
        F.col("j.doc_id").alias("doc_id"),
        F.col("j.seq").alias("seq"),
        F.col("j.after.tokens").alias("tokens"),
        F.col("j.after.n_tok").alias("n_tok"),
        F.col("j.after.source").alias("source"),
        F.col("j.ts").alias("ts"),
    )


class AuditGateError(RuntimeError):
    """A staged batch failed the WAP audit: main was NOT advanced and
    the audit branch was reset to the published head. The epoch was
    never fenced on main, so fixing the feed (or the checks) and
    re-running re-applies the batch cleanly — exactly-once holds."""


class ChangeLogTailer:
    def __init__(
        self,
        spark: SparkSession,
        feed_dir: str,
        table_root: str,
        app_id: str = "cdc",
        num_buckets: int | None = None,
        lineage_dir: str | None = None,
        verify: bool = True,
        post_batch_checks: list | None = None,
        feed_bucketed: bool = False,
        track_ndv: str | None = None,
        quarantine_root: str | None = None,
        wap_branch: str | None = None,
        audit_checks: list | None = None,
        audit_scope: str = "commit",
        transform=None,
        derived_views: list | None = None,
    ):
        self.spark = spark
        self.feed_dir = feed_dir
        kwargs = {"num_buckets": num_buckets} if num_buckets else {}
        self.table = SnapshotTable(spark, table_root, **kwargs)
        # opt-in dead-letter quarantine (operators/quarantine.py): rows
        # violating the change contract land in this side table with a
        # reason instead of failing or poisoning the batch
        self.quarantine = (
            SnapshotTable(spark, quarantine_root, **kwargs)
            if quarantine_root
            else None
        )
        self.app_id = app_id
        self.lineage_dir = lineage_dir or os.path.join(table_root, "_lineage")
        self.verify = verify
        # reference cadence: verify SQL suite after every load
        # (build_load_dag.py:220-234) — here one combined aggregation
        # over the folded table per applied batch (verify.run_checks)
        self.post_batch_checks = post_batch_checks
        # feed pre-partitioned by the table's bucket function (e.g. a
        # key-partitioned Kafka topic) -> shuffle-free apply
        self.feed_bucketed = feed_bucketed
        # opt-in incremental NDV statistic (operators/table_stats.py):
        # column name to track; costs one extra narrow agg per batch,
        # so it's off on the bench/throughput path by default
        self.track_ndv = track_ndv
        # opt-in write-audit-publish (reference: the verify-then-publish
        # DAG chain gating public views, build_verify_streaming_dag.py):
        # every batch commits to this branch first; audit_checks (a
        # verify.Check list) run against the STAGED head, and only a
        # passing batch fast-forwards main. Readers of main never see
        # unaudited rows; a failing batch resets the branch and raises
        # AuditGateError.
        self.wap_branch = wap_branch
        self.audit_checks = audit_checks
        # audit scope: "commit" (default) folds only the buckets the
        # staged commit touched — O(changed data) per batch, sound by
        # induction (every untouched bucket passed its own audit when
        # last written; bucket = f(doc_id), so per-bucket reads are
        # complete for key-scoped invariants). "table" re-audits the
        # full fold every batch (the reference's verify cadence) —
        # right for cross-bucket invariants, O(table) per batch.
        self.audit_scope = audit_scope
        # opt-in per-batch decode step applied BEFORE the CDC core —
        # the front door for self-describing feeds (e.g. a raw JSON
        # change-envelope column -> canonical change rows via
        # ``envelope_to_changes``). Must be a narrow DataFrame->
        # DataFrame map so the decoded batch stays one scan.
        self.transform = transform
        # opt-in derived maintainers that ride the ingest loop: any
        # object with ``refresh() -> dict | None`` whose cursor fences
        # on the target's snapshot version (NearDupIndex,
        # SecondaryIndex, IncrementalAggView, CdfFollower...). Each is
        # refreshed after every applied batch, so derived state lags
        # main by at most one batch; a crash between the table commit
        # and a refresh is self-healing (the next refresh's diff spans
        # both versions), and replayed batches are no-ops end to end.
        self.derived_views = derived_views or []
        self._staged_handle: SnapshotTable | None = None
        self.applied: list[dict] = []

    def _staged(self) -> SnapshotTable:
        """The table commits land on: main, or the WAP audit branch."""
        if self.wap_branch is None:
            return self.table
        try:
            self.table.ref_version(self.wap_branch)
        except ValueError:
            self.table.create_branch(self.wap_branch)
        if self._staged_handle is None:
            self._staged_handle = self.table.with_branch(self.wap_branch)
        return self._staged_handle

    def _wap_gate(self, target: SnapshotTable, lineage: dict) -> dict:
        """Audit the staged head; publish (fast-forward main) or reset."""
        details = None
        ok = True
        if self.audit_checks:
            from ethereum_etl_airflow_spark.verify import run_checks

            buckets = None
            if self.audit_scope == "commit":
                buckets = [
                    int(b) for b in target.snapshot().get("commit_buckets") or []
                ] or None
            details = run_checks(
                target.read(buckets=buckets), self.audit_checks, strict=False
            )
            ok = all(v.startswith("PASS") for v in details.values())
        if ok:
            head = self.table.fast_forward("main", self.wap_branch)
            lineage["wap"] = {
                "branch": self.wap_branch,
                "published_version": head,
                "audit": details,
            }
            return lineage
        # abandon the staged commit: branch snaps back to the published
        # head. Main never fenced this epoch, so a corrected re-run
        # re-applies it (exactly-once preserved).
        self.table.drop_branch(self.wap_branch)
        self.table.create_branch(self.wap_branch)
        self._staged_handle = self.table.with_branch(self.wap_branch)
        lineage["wap"] = {
            "branch": self.wap_branch,
            "published_version": None,
            "audit": details,
        }
        self._record_lineage(lineage)
        raise AuditGateError(
            f"epoch {lineage['epoch']} failed audit; main stays at "
            f"v{self.table.current_version()}: {details}"
        )

    def _apply(self, batch_df, app_id: str, epoch: int, props=None):
        """One batch through the CDC core, dead-lettering if enabled,
        staged + audited when WAP is on."""
        target = self._staged()
        if self.quarantine is not None:
            from ethereum_etl_airflow_spark.operators.quarantine import (
                apply_changes_quarantined,
            )

            combined = apply_changes_quarantined(
                target,
                self.quarantine,
                batch_df,
                app_id,
                epoch,
                verify=self.verify,
                feed_bucketed=self.feed_bucketed,
                properties=props,
            )
            lineage = combined["main"]
            if lineage is not None:
                lineage["quarantined_events"] = combined["quarantined_events"]
        else:
            lineage = apply_changes(
                target,
                batch_df,
                app_id,
                epoch=epoch,
                verify=self.verify,
                feed_bucketed=self.feed_bucketed,
                properties=props,
            )
        if self.wap_branch is not None and lineage is not None:
            lineage = self._wap_gate(target, lineage)
        return lineage

    def _run_post_checks(self, lineage: dict) -> None:
        if not self.post_batch_checks:
            return
        from ethereum_etl_airflow_spark.verify import run_checks

        lineage["checks"] = run_checks(self.table.read(), self.post_batch_checks)

    def _refresh_derived(self, lineage: dict) -> None:
        """Advance every registered derived maintainer to the table's
        new head; per-view refresh info joins the batch lineage. Both
        maintainer protocols are accepted: ``refresh()`` (the index
        family) and ``run_until_caught_up()`` (the CDF-view family)."""
        if not self.derived_views:
            return
        out = []
        for v in self.derived_views:
            if hasattr(v, "refresh"):
                info = v.refresh()
            else:
                info = v.run_until_caught_up()
            out.append({"view": type(v).__name__, "info": info})
        lineage["derived"] = out

    # ------------------------------------------------------------- lineage

    def _record_lineage(self, lineage: dict) -> None:
        os.makedirs(self.lineage_dir, exist_ok=True)
        app = lineage["app_id"].replace(":", "_")
        path = os.path.join(self.lineage_dir, f"epoch-{app}-{lineage['epoch']:012d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(lineage, f)
        os.replace(tmp, path)
        self.applied.append(lineage)

    def lineage(self):
        """Lineage as a DataFrame (queryable metadata table)."""
        return self.spark.read.json(os.path.join(self.lineage_dir, "epoch-*.json"))

    def total_events_per_sec(self) -> float | None:
        total_ev = sum(li["events_in"] for li in self.applied)
        total_s = sum(li["wall_sec"] for li in self.applied)
        return round(total_ev / total_s, 2) if total_s else None

    # ---------------------------------------------------------- bootstrap

    def bootstrap_from_state(self, state_df, upto_epoch: int) -> dict:
        """Debezium-style initial snapshot: seed an EMPTY table with an
        existing consistent state (folded rows INCLUDING per-row
        ``_seq`` versions — another table's ``read_raw()``, or a source
        dump with its change positions) and fence every epoch <=
        ``upto_epoch`` in the same atomic commit, so
        ``replay_batches()``/``run_stream`` resume from the first
        unseen batch instead of re-reading history.

        Convergence never DEPENDS on the skip — the LWW fold is
        idempotent, so replaying history over a bootstrap is merely
        wasted work — the skip is what makes "snapshot then stream"
        O(state) + O(tail) instead of O(full history). Keeping the
        source's own ``_seq`` (not a synthetic one) preserves the
        ordering contract: a late feed event older than the
        bootstrapped row's version still loses the fold. Bypasses the
        WAP gate and quarantine (a bootstrap is a trusted bulk load,
        not an untrusted feed batch)."""
        from pyspark.sql import functions as F

        from ethereum_etl_airflow_spark.sinks.snapshot_table import bucket_expr

        if self.table.exists() and self.table.current_version() >= 0:
            raise ValueError("bootstrap_from_state requires an empty table")
        missing = {"doc_id", "_seq"} - set(state_df.columns)
        if missing:
            raise ValueError(f"bootstrap state missing columns {sorted(missing)}")
        out = state_df
        if "_epoch" not in out.columns:
            out = out.withColumn("_epoch", F.lit(upto_epoch).cast("long"))
        if "_tombstone" not in out.columns:
            out = out.withColumn("_tombstone", F.lit(False))
        out = out.withColumn(
            "_bucket", bucket_expr(F.col("doc_id"), self.table.num_buckets)
        )
        snap = self.table.commit(
            out,
            replace_buckets=set(),
            app_id=self.app_id,
            epoch=upto_epoch,  # fences all history <= upto_epoch atomically
            new_schema=out.drop("_bucket").schema,
            lineage={"op": "bootstrap", "upto_epoch": upto_epoch},
        )
        li = {
            "app_id": self.app_id,
            "epoch": upto_epoch,
            "op": "bootstrap",
            "snapshot_version": snap["version"],
            "rows": sum(int(n) for n in snap.get("bucket_rows_written", {}).values()),
            # bulk-loaded state rows are not feed events: zero here
            # keeps total_events_per_sec an honest tail-only metric
            "events_in": 0,
            "wall_sec": 0.0,
        }
        self._record_lineage(li)
        return li

    # ------------------------------------------------------- batch replay

    def rewind(self, epoch: int) -> dict | None:
        """Chain-reorg recovery: roll the table back to the state as of
        feed batch ``epoch`` and reset the epoch fence, atomically
        (operators/reorg.py). Registered derived views catch up on the
        rewind commit like on any other. After replacing the orphaned
        ``batch-(epoch+1)..`` feed directories with corrected ones,
        ``replay_batches()`` re-applies them exactly-once.

        Stream mode self-heals: the rewind commit bumps the app's
        ``stream_gen`` property, and the next ``run_stream`` call with
        the SAME checkpoint dir rotates to a fresh generation subdir +
        fence namespace — corrected batch dirs reusing orphaned paths
        are re-read (the file source's seen-paths memory is per
        generation), and the forced re-read of kept batches is an LWW
        no-op. No manual checkpoint surgery (r3 VERDICT do-this #5)."""
        from ethereum_etl_airflow_spark.operators.reorg import rewind_to_epoch

        info = rewind_to_epoch(self.table, self.app_id, epoch)
        if info is not None:
            lineage = {"app_id": self.app_id, "epoch": epoch, "op": "reorg_rewind", **info}
            self._refresh_derived(lineage)
            self._record_lineage(lineage)
        return info

    def rewind_to_seq(self, seq: int) -> dict | None:
        """Chain-height reorg recovery for STREAM-MODE ingest, where
        Spark's checkpoint batchIds don't map to chain heights: rolls
        back every applied event with ``seq`` above the given position
        using the per-commit ``offset_range`` lineage, restores every
        fence namespace of this app, and bumps the stream generation so
        the next ``run_stream`` re-reads corrected batch dirs
        automatically (operators/reorg.rewind_to_seq)."""
        from ethereum_etl_airflow_spark.operators.reorg import rewind_to_seq

        info = rewind_to_seq(self.table, self.app_id, seq)
        if info is not None:
            lineage = {
                "app_id": self.app_id,
                "seq": seq,
                "epoch": info["restored_epoch"],
                "op": "reorg_rewind",
                **info,
            }
            self._refresh_derived(lineage)
            self._record_lineage(lineage)
        return info

    def replay_batches(self, start: int = 0, end: int | None = None) -> list[dict]:
        """Apply feed batches in order; fenced epochs are skipped, so a
        resumed/replayed run converges to the same final state."""
        batch_dirs = sorted(
            (int(m.group(1)), os.path.join(self.feed_dir, d))
            for d in os.listdir(self.feed_dir)
            if (m := re.match(r"batch-(\d+)$", d))
        )
        results = []
        for batch_id, path in batch_dirs:
            if batch_id < start or (end is not None and batch_id > end):
                continue
            batch_df = self.spark.read.parquet(path)
            if self.transform is not None:
                batch_df = self.transform(batch_df)
            props = None
            if self.track_ndv:
                from ethereum_etl_airflow_spark.operators import table_stats

                props = table_stats.props_for_batch(
                    self.table, batch_df, self.track_ndv
                )
            lineage = self._apply(batch_df, self.app_id, batch_id, props)
            if lineage is not None:
                if self.track_ndv:
                    from ethereum_etl_airflow_spark.operators import table_stats

                    lineage["ndv_estimate"] = round(
                        table_stats.distinct_estimate(self.table, self.track_ndv), 1
                    )
                self._run_post_checks(lineage)
                self._refresh_derived(lineage)
                self._record_lineage(lineage)
                results.append(lineage)
        return results

    # ---------------------------------------------------------- streaming

    def run_stream(
        self,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        available_now: bool = True,
        max_bytes_per_trigger: str | None = None,
        processing_time: str | None = None,
    ):
        """Structured Streaming drive: file source -> foreachBatch apply.

        Backpressure / rate limiting (the admission-control knobs a
        10^10-event backlog replay needs so one trigger never bites off
        more than executor memory chews):

        * ``max_files_per_trigger`` — cap source files admitted per
          micro-batch (file-count shaped feeds);
        * ``max_bytes_per_trigger`` — cap admitted bytes (e.g. "512m"),
          the size-shaped equivalent (maps to the file source's
          ``maxBytesPerTrigger`` soft limit);
        * ``processing_time`` — follow-mode cadence (e.g. "30 seconds"):
          the trigger interval is the reference's sensor poke_interval
          analogue (build_load_dag.py sensor cadence).

        Spark's checkpoint makes batch replay after failure possible;
        the epoch fence in the sink makes it harmless (exactly-once).
        Epochs are Spark's monotone per-checkpoint ``batchId``, fenced
        under the ``<app_id>:stream`` namespace so resumes of the same
        checkpoint skip already-committed batches. Note the MERGE
        itself is idempotent at event level (same (doc_id, seq) ->
        same winner), so fencing only avoids re-work — correctness
        never depends on it.
        """
        sample = self.spark.read.option("recursiveFileLookup", "true").parquet(self.feed_dir)
        reader = self.spark.readStream.schema(sample.schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        if max_bytes_per_trigger:
            reader = reader.option("maxBytesPerTrigger", str(max_bytes_per_trigger))
        stream = reader.option("recursiveFileLookup", "true").parquet(self.feed_dir)

        # checkpoint GENERATION: a reorg rewind bumps stream_gen:<app>
        # in the same atomic commit that resets the fence, so the next
        # run_stream call automatically rotates to a fresh checkpoint
        # subdir (the file source's seen-paths memory would silently
        # skip corrected batch dirs that reuse orphaned paths) and a
        # fresh fence namespace (batchIds restart at 0 under a new
        # checkpoint). Re-reading pre-rewind files is a no-op: the LWW
        # fold resolves identical (doc_id, seq) events to the same
        # winner, so exactly-once of the STATE is preserved by design.
        gen = int(
            self.table.snapshot()["properties"].get(f"stream_gen:{self.app_id}", 0)
        )
        if gen:
            checkpoint_dir = os.path.join(checkpoint_dir, f"gen-{gen}")
            stream_app = f"{self.app_id}:stream:g{gen}"
        else:
            # generation 0 keeps the caller's dir and fence namespace
            # verbatim: checkpoints (and their high batchIds) from
            # before generations existed stay valid — relocating them
            # would fence genuinely new batches behind the old batchId
            # high-water mark and silently drop them
            stream_app = f"{self.app_id}:stream"

        def _apply(batch_df, epoch_id: int):
            if self.transform is not None:
                batch_df = self.transform(batch_df)
            lineage = self._apply(batch_df, stream_app, epoch_id)
            if lineage is not None:
                self._run_post_checks(lineage)
                self._refresh_derived(lineage)
                self._record_lineage(lineage)

        writer = (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        q = writer.start()
        if available_now:
            q.awaitTermination()
        return q
