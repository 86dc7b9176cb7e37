"""Streaming gap-sessionization: cross-micro-batch session stitching,
gap closure, event-time-timeout closure, and exactly-once emission
across checkpointed restarts.

Each stage writes one feed file and drives the stream AvailableNow
against the SAME checkpoint — i.e. every stage is a restart, so the
exactly-once claim (no closed session emitted twice across restarts)
is exercised by construction."""

from __future__ import annotations

import datetime as dt
import pytest
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.streaming.sessions import (
    SESSION_GAP_SEC,
    run_session_stream,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _sec(s):
    return T0 + dt.timedelta(seconds=s)


def _feed(spark, feed_dir, rows, name):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    df.coalesce(1).write.mode("overwrite").parquet(f"{feed_dir}/{name}")


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "feed"), str(tmp_path / "cp"), str(tmp_path / "out")


class _Runner:
    """Runs the stream and returns only the sessions NEW since the
    previous run (the parquet sink accumulates)."""

    def __init__(self):
        self.seen: list = []

    def __call__(self, spark, feed, cp, out):
        df = run_session_stream(spark, feed, cp, out)
        rows = [
            (
                r["user_id"],
                r["session_start"],
                r["session_end"],
                r["n_events"],
                r["total_value"],
            )
            for r in df.collect()
        ]
        prev = list(self.seen)
        for p in prev:
            rows.remove(p)  # raises if a session was emitted twice
        self.seen = prev + rows
        return rows


def test_sessions_across_restarts_exactly_once(spark, dirs):
    feed, cp, out = dirs
    run = _Runner()
    emitted = []

    # stage 1: open sessions only -> nothing closes
    _feed(
        spark,
        feed,
        [(1, _sec(0), 1.0), (1, _sec(100), 2.0), (2, _sec(50), 5.0)],
        "f0",
    )
    got = run(spark, feed, cp, out)
    assert got == []

    # stage 2 (restart): gap-exceeding events close both open sessions;
    # AvailableNow then runs a final timeout pass with the batch-end
    # watermark (60000-gap), which ALSO closes user 1's brand-new idle
    # session at 3000 — eager but correct
    _feed(
        spark,
        feed,
        [(1, _sec(3000), 1.0), (2, _sec(60000), 1.0)],
        "f1",
    )
    got = run(spark, feed, cp, out)
    emitted += got
    assert sorted(got) == [
        (1, _sec(0), _sec(100), 2, 3.0),
        (1, _sec(3000), _sec(3000), 1, 1.0),
        (2, _sec(50), _sec(50), 1, 5.0),
    ]

    # stage 3 (restart): watermark flush fires user 2's pending timeout
    _feed(spark, feed, [(3, _sec(200000), 0.5)], "f2")
    got = run(spark, feed, cp, out)
    emitted += got
    assert got == [(2, _sec(60000), _sec(60000), 1, 1.0)]

    # stage 4 (restart): an event INSIDE user 3's gap extends the open
    # session instead of closing anything
    _feed(spark, feed, [(3, _sec(200000 + SESSION_GAP_SEC - 10), 0.5)], "f3")
    got = run(spark, feed, cp, out)
    emitted += got
    assert got == []

    # exactly-once across all restarts: every closed session appeared once
    assert len(emitted) == len(set(emitted)) == 4


def test_closed_sessions_match_batch_operator(spark, dirs, tmp_path):
    """For fully-quiesced users the streaming result must equal the
    batch sessionize_events aggregate over the same events."""
    from ethereum_etl_airflow_spark.operators.temporal import sessionize_events

    feed, cp, out = dirs
    run = _Runner()
    rows = []
    for u in (1, 2, 3):
        base = u * 10_000
        rows += [
            (u, _sec(base), 1.0),
            (u, _sec(base + 600), 2.0),
            (u, _sec(base + 600 + SESSION_GAP_SEC + 1), 3.0),  # new session
        ]
    _feed(spark, feed, rows, "f0")
    run(spark, feed, cp, out)
    # flush far in the future so every session times out
    _feed(spark, feed, [(99, _sec(10_000_000), 0.0)], "f1")
    _feed(spark, feed, [(99, _sec(20_000_000), 0.0)], "f2")
    run(spark, feed, cp, out)
    streaming = {r for r in run.seen if r[0] != 99}

    # batch twin over the identical events (events-table layout)
    ev_dir = str(tmp_path / "batch")
    spark.createDataFrame(
        [(i, r[1], r[0], "click", r[2], "{}") for i, r in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{ev_dir}/events.parquet")
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in sessionize_events(spark, ev_dir).collect()
    }
    assert streaming == batch


def test_intra_batch_multi_session_split(spark, dirs):
    """Three sessions inside ONE micro-batch: the two leading ones
    close immediately (vectorized split), the trailing one stays open."""
    feed, cp, out = dirs
    run = _Runner()
    g = SESSION_GAP_SEC
    _feed(
        spark,
        feed,
        [
            (5, _sec(0), 1.0),
            (5, _sec(10), 1.0),
            (5, _sec(10 + g + 1), 2.0),
            (5, _sec(10 + g + 1 + g + 5), 4.0),
        ],
        "f0",
    )
    got = run(spark, feed, cp, out)
    assert sorted(got) == [
        (5, _sec(0), _sec(10), 2, 2.0),
        (5, _sec(10 + g + 1), _sec(10 + g + 1), 1, 2.0),
    ]
