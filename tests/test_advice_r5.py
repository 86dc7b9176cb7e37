"""Regression tests for the round-4 ADVICE findings.

1. ``rewind_to_seq`` must not silently treat a cdc_apply commit with
   added data files but ZERO footer seq-range evidence as valid — it
   raises, steering the operator to ``rewind_to_epoch``.
2. Rewinds only bump ``stream_gen:<app>`` (forcing the next
   ``run_stream`` to rotate its checkpoint and re-read the WHOLE feed
   dir) when the app shows streaming evidence; replay-only tables keep
   their generation.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.operators.reorg import (
    rewind_to_epoch,
    rewind_to_seq,
)
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable
from ethereum_etl_airflow_spark.sources.feed import FeedConfig, generate_batch

CFG = FeedConfig(n_docs=60, events_per_batch=120, n_batches=3, dup_tail=0, seed=5)


def _batch_max_seq(spark, b: int) -> int:
    import pyspark.sql.functions as F

    return generate_batch(spark, CFG, b).agg(F.max("seq")).first()[0]


def _build(spark, path, app="rg", n=3):
    table = SnapshotTable(spark, path, num_buckets=4)
    for b in range(n):
        apply_changes(table, generate_batch(spark, CFG, b), app, epoch=b)
    return table


def _head_manifest_path(table) -> str:
    metas = sorted(
        glob.glob(os.path.join(table.root, "_meta", "snapshot-*.json"))
    )
    assert metas
    return metas[-1]


def test_rewind_to_seq_raises_on_rangeless_cdc_commit(spark, tmp_path):
    table = _build(spark, str(tmp_path / "t"))
    # simulate a commit whose footer-stats collection failed: the head
    # cdc_apply commit keeps its added files but loses every seq range
    mpath = _head_manifest_path(table)
    with open(mpath) as f:
        snap = json.load(f)
    assert snap["lineage"]["op"] == "cdc_apply" and snap.get("added_files")
    snap["file_seq_ranges"] = {}
    with open(mpath, "w") as f:
        json.dump(snap, f)
    with pytest.raises(ValueError, match="no footer seq-range evidence"):
        rewind_to_seq(table, "rg", seq=_batch_max_seq(spark, 1))
    # the documented fallback still works on the same table
    assert rewind_to_epoch(table, "rg", epoch=0) is not None


def test_property_only_commits_still_skip_quietly(spark, tmp_path):
    """A commit that added NO files (property-only) legitimately has no
    seq evidence — the walk must keep skipping those, not raise."""
    table = _build(spark, str(tmp_path / "t"))
    mpath = _head_manifest_path(table)
    with open(mpath) as f:
        snap = json.load(f)
    snap["added_files"] = {}
    snap["file_seq_ranges"] = {}
    with open(mpath, "w") as f:
        json.dump(snap, f)
    # head commit skipped; older commits bound the walk normally
    info = rewind_to_seq(table, "rg", seq=_batch_max_seq(spark, 0))
    assert info is not None


def test_replay_only_rewind_keeps_stream_generation(spark, tmp_path):
    table = _build(spark, str(tmp_path / "t"))
    assert rewind_to_epoch(table, "rg", epoch=1) is not None
    props = table.snapshot()["properties"]
    assert "stream_gen:rg" not in props  # no streaming evidence -> no bump


def test_streamed_app_rewind_bumps_generation(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    # stream-mode ingest commits under the app's :stream fence namespace
    for b in range(3):
        apply_changes(table, generate_batch(spark, CFG, b), "rg:stream", epoch=b)
    assert rewind_to_seq(table, "rg", seq=_batch_max_seq(spark, 1)) is not None
    props = table.snapshot()["properties"]
    assert int(props.get("stream_gen:rg", 0)) == 1
    # a second rewind keeps counting
    assert rewind_to_seq(table, "rg", seq=_batch_max_seq(spark, 0)) is not None
    assert int(table.snapshot()["properties"]["stream_gen:rg"]) == 2
