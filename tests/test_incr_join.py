"""Incremental join-view maintenance (operators/incr_join.py): the
materialized fact ⟕ dim join stays equal to a from-scratch recompute
through fact churn, dimension churn, fk re-pointing, partner loss
(left-join nulls), crash-replay, and multi-batch catchup — maintained
from BOTH upstreams' CDFs, only affected keys rewritten."""

from __future__ import annotations

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.operators.incr_join import IncrementalJoinView
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable


def _fact_batch(spark, rows):
    """rows: (op, doc_id, seq, fk, amount)"""
    return spark.createDataFrame(
        rows, "op string, doc_id string, seq long, fk string, amount long"
    )


def _dim_batch(spark, rows):
    """rows: (op, doc_id, seq, segment)"""
    return spark.createDataFrame(
        rows, "op string, doc_id string, seq long, segment string"
    )


def _mk(spark, tmp_path):
    fact = SnapshotTable(spark, str(tmp_path / "fact"), num_buckets=4)
    dim = SnapshotTable(spark, str(tmp_path / "dim"), num_buckets=4)
    view = IncrementalJoinView(
        spark, fact, dim, str(tmp_path / "view"), fk_col="fk", num_buckets=4
    )
    return fact, dim, view


def _as_dict(df):
    cols = ["fk", "amount", "r_segment"]
    return {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in df.select("doc_id", *cols).collect()
    }


def _check(view):
    assert _as_dict(view.read()) == _as_dict(view.recompute())


def test_initial_build_and_left_semantics(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    apply_changes(
        dim, _dim_batch(spark, [("I", "d1", 1, "gold"), ("I", "d2", 2, "iron")]),
        "feed", 0,
    )
    apply_changes(
        fact,
        _fact_batch(
            spark,
            [("I", "a", 1, "d1", 10), ("I", "b", 2, "d2", 20), ("I", "c", 3, "dX", 30)],
        ),
        "feed", 0,
    )
    view.run_until_caught_up()
    got = _as_dict(view.read())
    assert got == {
        "a": ("d1", 10, "gold"),
        "b": ("d2", 20, "iron"),
        "c": ("dX", 30, None),  # dangling fk survives with null dim payload
    }
    _check(view)


def test_fact_churn_only_touches_changed_keys(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    apply_changes(dim, _dim_batch(spark, [("I", "d1", 1, "gold")]), "feed", 0)
    apply_changes(
        fact, _fact_batch(spark, [("I", "a", 1, "d1", 10), ("I", "b", 2, "d1", 20)]),
        "feed", 0,
    )
    view.run_until_caught_up()
    # update a, delete b, insert c — all in one upstream batch
    apply_changes(
        fact,
        _fact_batch(
            spark, [("U", "a", 3, "d1", 11), ("D", "b", 4, None, None), ("I", "c", 5, "d1", 5)]
        ),
        "feed", 1,
    )
    view.run_until_caught_up()
    got = _as_dict(view.read())
    assert got == {"a": ("d1", 11, "gold"), "c": ("d1", 5, "gold")}
    _check(view)


def test_dim_update_propagates_to_referencing_rows(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    apply_changes(
        dim, _dim_batch(spark, [("I", "d1", 1, "gold"), ("I", "d2", 2, "iron")]),
        "feed", 0,
    )
    apply_changes(
        fact,
        _fact_batch(
            spark,
            [("I", "a", 1, "d1", 10), ("I", "b", 2, "d1", 20), ("I", "c", 3, "d2", 30)],
        ),
        "feed", 0,
    )
    view.run_until_caught_up()
    # rename d1; d2 untouched — a and b must refresh, c must not churn
    apply_changes(dim, _dim_batch(spark, [("U", "d1", 4, "platinum")]), "feed", 1)
    view.run_until_caught_up()
    got = _as_dict(view.read())
    assert got["a"] == ("d1", 10, "platinum")
    assert got["b"] == ("d1", 20, "platinum")
    assert got["c"] == ("d2", 30, "iron")
    _check(view)
    # partner loss: deleting d2 nulls c's payload but keeps the row
    apply_changes(dim, _dim_batch(spark, [("D", "d2", 5, None)]), "feed", 2)
    view.run_until_caught_up()
    assert _as_dict(view.read())["c"] == ("d2", 30, None)
    _check(view)


def test_fk_repoint_moves_partner(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    apply_changes(
        dim, _dim_batch(spark, [("I", "d1", 1, "gold"), ("I", "d2", 2, "iron")]),
        "feed", 0,
    )
    apply_changes(fact, _fact_batch(spark, [("I", "a", 1, "d1", 10)]), "feed", 0)
    view.run_until_caught_up()
    apply_changes(fact, _fact_batch(spark, [("U", "a", 2, "d2", 10)]), "feed", 1)
    view.run_until_caught_up()
    assert _as_dict(view.read())["a"] == ("d2", 10, "iron")
    _check(view)


def test_crash_replay_is_exactly_once(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    apply_changes(dim, _dim_batch(spark, [("I", "d1", 1, "gold")]), "feed", 0)
    apply_changes(fact, _fact_batch(spark, [("I", "a", 1, "d1", 10)]), "feed", 0)
    view.run_until_caught_up()
    v_before = view.table.current_version()

    # a fresh instance (crashed driver) replays the same cycle: fenced
    view2 = IncrementalJoinView(
        spark, fact, dim, str(tmp_path / "view"), fk_col="fk", num_buckets=4
    )
    assert view2.process_once() is None
    assert view2.table.current_version() == v_before
    _check(view2)


def test_multi_batch_catchup_both_sides(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    apply_changes(dim, _dim_batch(spark, [("I", "d1", 1, "gold")]), "feed", 0)
    apply_changes(fact, _fact_batch(spark, [("I", "a", 1, "d1", 1)]), "feed", 0)
    apply_changes(fact, _fact_batch(spark, [("I", "b", 2, "d1", 2)]), "feed", 1)
    apply_changes(dim, _dim_batch(spark, [("U", "d1", 3, "silver")]), "feed", 1)
    apply_changes(fact, _fact_batch(spark, [("U", "a", 4, "d1", 9)]), "feed", 2)
    # one catchup over 3 fact + 2 dim versions
    cycles = view.run_until_caught_up()
    assert len(cycles) >= 1
    assert _as_dict(view.read()) == {
        "a": ("d1", 9, "silver"),
        "b": ("d1", 2, "silver"),
    }
    _check(view)
    # cursor landed exactly on the heads
    assert view.cursor() == (
        fact.current_version(),
        dim.current_version(),
    )


def test_view_cdf_emits_deletes_for_vanished_rows(spark, tmp_path):
    from ethereum_etl_airflow_spark.operators.changes import table_changes

    fact, dim, view = _mk(spark, tmp_path)
    apply_changes(dim, _dim_batch(spark, [("I", "d1", 1, "gold")]), "feed", 0)
    apply_changes(fact, _fact_batch(spark, [("I", "a", 1, "d1", 10)]), "feed", 0)
    view.run_until_caught_up()
    v1 = view.table.current_version()
    apply_changes(fact, _fact_batch(spark, [("D", "a", 2, None, None)]), "feed", 1)
    view.run_until_caught_up()
    ch = table_changes(view.table, v1)
    kinds = {(r["doc_id"], r["_change_type"]) for r in ch.collect()}
    assert ("a", "delete") in kinds  # tombstoned -> downstream CDF delete
