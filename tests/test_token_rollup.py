"""TokenVocabRollup engine behaviors not visible through the oracle
query: bucket-pruned refreshes, fencing, zero-count eviction, and the
expired-base full-recompute fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.operators.token_rollup import TokenVocabRollup
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable

CH_SCHEMA = "op string, doc_id string, seq long, tokens array<string>"


def _apply(table, spark, rows, epoch):
    apply_changes(table, spark.createDataFrame(rows, CH_SCHEMA), "t", epoch=epoch)


@pytest.fixture()
def setup(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    vr = TokenVocabRollup(table, str(tmp_path / "v"), num_buckets=8)
    _apply(
        table,
        spark,
        [
            ("U", "a", 1, ["x", "y", "x"]),
            ("U", "b", 2, ["y", "z"]),
            ("U", "c", 3, ["z"]),
        ],
        epoch=0,
    )
    vr.refresh()
    return table, vr


def _vocab(vr):
    return {
        r["token"]: (r["n_occ"], r["n_docs"]) for r in vr.read_vocab().collect()
    }


def test_initial_build(setup):
    _, vr = setup
    assert _vocab(vr) == {"x": (2, 1), "y": (2, 2), "z": (2, 2)}


def test_incremental_update_delete_and_eviction(setup, spark):
    table, vr = setup
    # delete b (removes one y, one z); retokenize a to ["w"] (removes
    # two x, one y) -> x and y vanish entirely, z drops to c's copy
    _apply(table, spark, [("D", "b", 10, None), ("U", "a", 11, ["w"])], epoch=1)
    info = vr.refresh()
    assert info is not None
    assert _vocab(vr) == {"w": (1, 1), "z": (1, 1)}


def test_refresh_is_fenced(setup):
    table, vr = setup
    assert vr.refresh() is None  # already at target version
    assert vr.last_target_version() == table.current_version()


def test_refresh_prunes_vocab_buckets(setup, spark):
    table, vr = setup
    # a one-token delta touches at most 2 vocab buckets (old + new token)
    _apply(table, spark, [("U", "c", 20, ["z", "q"])], epoch=1)
    vr.refresh()
    lineage = vr.vocab.snapshot(vr.vocab.current_version())["lineage"]
    assert lineage["op"] == "vocab_refresh"
    assert 1 <= lineage["buckets_rewritten"] <= 2
    assert _vocab(vr)["q"] == (1, 1)
    assert _vocab(vr)["z"] == (2, 2)  # b's copy + c's (still single) copy


def test_expired_base_falls_back_to_full_recompute(setup, spark):
    table, vr = setup
    _apply(table, spark, [("U", "d", 30, ["v"])], epoch=1)
    _apply(table, spark, [("U", "e", 31, ["v"])], epoch=2)
    # expire everything but the newest snapshot, including the rollup's base
    table.expire_snapshots(keep_last=1)
    info = vr.refresh()
    assert info is not None
    got = _vocab(vr)
    assert got["v"] == (2, 2)
    assert got["x"] == (2, 1)  # pre-existing counts survive the rebuild
