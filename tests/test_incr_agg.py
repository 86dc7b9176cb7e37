"""Incremental aggregate view maintenance (operators/incr_agg.py):
the materialized GROUP BY stays equal to a from-scratch recompute
through arbitrary insert/update/delete mixes, crash-replay, and group
birth/death — maintained purely from the upstream CDF's pre/post
images, never by rescanning the base table."""

from decimal import Decimal

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.operators.incr_agg import IncrementalAggView
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable


def _batch(spark, rows):
    """rows: (op, doc_id, seq, grp, val)"""
    df = spark.createDataFrame(
        rows, "op string, doc_id string, seq long, grp string, val long"
    )
    return df.withColumn("ts", F.timestamp_seconds(F.col("seq")).cast("timestamp_ntz"))


def _mk(spark, tmp_path):
    up = SnapshotTable(spark, str(tmp_path / "up"), num_buckets=4)
    view = IncrementalAggView(
        spark, up, str(tmp_path / "agg"), key_col="grp", val_col="val", num_buckets=4
    )
    return up, view


def _as_dict(df):
    return {r["doc_id"]: (r["sum_val"], r["cnt"]) for r in df.collect()}


def _check(view):
    assert _as_dict(view.read()) == _as_dict(view.recompute())


def test_view_tracks_inserts_updates_deletes(spark, tmp_path):
    up, view = _mk(spark, tmp_path)
    apply_changes(
        up,
        _batch(spark, [("I", "a", 1, "g1", 10), ("I", "b", 2, "g1", 5), ("I", "c", 3, "g2", 7)]),
        "feed", 0,
    )
    view.run_until_caught_up()
    got = _as_dict(view.read())
    assert got["g1"] == (Decimal("10.000000") + 5, 2)
    _check(view)

    # update moves a row BETWEEN groups: retract from g1, apply to g2
    apply_changes(
        up,
        _batch(spark, [("U", "b", 4, "g2", 6), ("D", "c", 5, None, None), ("I", "d", 6, "g3", 1)]),
        "feed", 1,
    )
    view.run_until_caught_up()
    got = _as_dict(view.read())
    assert got["g1"] == (Decimal("10.000000"), 1)
    assert got["g2"] == (Decimal("6.000000"), 1)  # c deleted, b arrived
    assert got["g3"] == (Decimal("1.000000"), 1)
    _check(view)


def test_group_death_tombstones_and_rebirth(spark, tmp_path):
    up, view = _mk(spark, tmp_path)
    apply_changes(up, _batch(spark, [("I", "a", 1, "g1", 3)]), "feed", 0)
    view.run_until_caught_up()
    apply_changes(up, _batch(spark, [("D", "a", 2, None, None)]), "feed", 1)
    view.run_until_caught_up()
    assert _as_dict(view.read()) == {}  # group died -> tombstoned
    _check(view)
    apply_changes(up, _batch(spark, [("I", "z", 3, "g1", 8)]), "feed", 2)
    view.run_until_caught_up()
    assert _as_dict(view.read())["g1"] == (Decimal("8.000000"), 1)
    _check(view)


def test_crash_replay_is_exactly_once(spark, tmp_path):
    """A fresh view instance at the same root resumes from the fenced
    cursor: re-running process_once for an already-folded range is a
    no-op (no double counting)."""
    up, view = _mk(spark, tmp_path)
    apply_changes(up, _batch(spark, [("I", "a", 1, "g1", 10)]), "feed", 0)
    view.run_until_caught_up()
    # simulated crash: new instance, same storage
    view2 = IncrementalAggView(
        spark, up, str(tmp_path / "agg"), key_col="grp", val_col="val", num_buckets=4
    )
    assert view2.cursor() == view.cursor()
    assert view2.process_once() is None  # fenced — nothing re-applied
    assert _as_dict(view2.read())["g1"] == (Decimal("10.000000"), 1)
    apply_changes(up, _batch(spark, [("U", "a", 2, "g1", 11)]), "feed", 1)
    view2.run_until_caught_up()
    assert _as_dict(view2.read())["g1"] == (Decimal("11.000000"), 1)
    _check(view2)


def test_multi_batch_catchup_in_one_cycle(spark, tmp_path):
    """Several upstream commits land before the view polls: one cycle
    folds the NET range (intermediate flips collapse upstream)."""
    up, view = _mk(spark, tmp_path)
    apply_changes(up, _batch(spark, [("I", "a", 1, "g1", 1)]), "feed", 0)
    apply_changes(up, _batch(spark, [("U", "a", 2, "g1", 2)]), "feed", 1)
    apply_changes(up, _batch(spark, [("U", "a", 3, "g2", 4), ("I", "b", 4, "g1", 9)]), "feed", 2)
    cycles = view.run_until_caught_up()
    assert len(cycles) == 1
    got = _as_dict(view.read())
    assert got["g1"] == (Decimal("9.000000"), 1)
    assert got["g2"] == (Decimal("4.000000"), 1)
    _check(view)


# ---------------------------------------------------------------------------
# Property-based IVM equivalence: for ANY insert/update/delete event
# sequence split across arbitrary view polls, the delta-maintained
# aggregate equals a from-scratch recompute at every poll point.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_DOCS = ["a", "b", "c", "d"]
_GRPS = ["g1", "g2", "g3"]


@st.composite
def _op_log(draw):
    n = draw(st.integers(min_value=1, max_value=20))
    events = []
    for seq in range(1, n + 1):
        doc = draw(st.sampled_from(_DOCS))
        op = draw(st.sampled_from(["I", "U", "D"]))
        grp = None if op == "D" else draw(st.sampled_from(_GRPS))
        val = None if op == "D" else draw(st.integers(-5, 20))
        events.append((op, doc, seq, grp, val))
    n_chunks = draw(st.integers(1, 3))
    bounds = sorted(
        draw(st.lists(st.integers(0, n), min_size=n_chunks - 1, max_size=n_chunks - 1))
    )
    chunks, prev = [], 0
    for b in bounds + [n]:
        chunks.append(events[prev:b])
        prev = b
    return chunks


@given(_op_log())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_view_equals_recompute_for_any_op_log(spark, tmp_path_factory, chunks):
    root = tmp_path_factory.mktemp("ivm")
    up = SnapshotTable(spark, str(root / "up"), num_buckets=4)
    view = IncrementalAggView(
        spark, up, str(root / "agg"), key_col="grp", val_col="val", num_buckets=4
    )
    epoch = 0
    for chunk in chunks:
        if chunk:
            apply_changes(up, _batch(spark, chunk), "feed", epoch)
            epoch += 1
        view.run_until_caught_up()
        # the view must equal a from-scratch recompute AT EVERY poll
        # point, not just at the end (intermediate states matter to
        # downstream consumers of the view's own CDF)
        assert _as_dict(view.read()) == _as_dict(view.recompute())
