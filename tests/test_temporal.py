"""Edge-case semantics of the temporal operators (operators/temporal.py).

The sf0.01 oracle run (driver_sim) validates the operators on real
distributions; these tests pin the BOUNDARY rules on hand-built frames:

* as-of: probes strictly before any build row get NULLs; a probe AT a
  build timestamp sees that build row (inclusive ``>=``); ties on the
  build side resolve to the greatest orderkey.
* sessionize: a gap of exactly 1800 s does NOT open a new session
  (rule is ``> 1800``); 1801 s does.
* banded range join: the band decomposition is EXACT — a purchase at
  ``e_ts`` is excluded (strict ``<``), at ``e_ts - 600 s`` included,
  and band-boundary crossings are not lost.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.operators.temporal import (
    ASOF_BUCKET_SEC,
    asof_join_bucketed,
    asof_join_last_order,
    range_join_banded,
    sessionize_events,
)

EV_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
OD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
    "o_orderdate timestamp_ntz, o_orderpriority string, o_clerk string, "
    "o_shippriority int, o_comment string"
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _write(spark, tmp_path, name, rows, schema):
    p = str(tmp_path / f"{name}.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(p)


def _order(okey, cust, when, price):
    return (okey, cust, "O", price, _ts(when), "1-URGENT", "clerk", 0, "")


def _event(eid, when, user, etype="click", value=1.0):
    return (eid, _ts(when), user, etype, value, "{}")


def test_asof_boundaries(spark, tmp_path):
    _write(
        spark,
        tmp_path,
        "orders",
        [
            _order(10, 1, "2024-01-01T00:00:00", 100.0),
            _order(11, 1, "2024-01-01T00:00:00", 200.0),  # tie: greater key wins
            _order(12, 1, "2024-01-03T00:00:00", 300.0),
            _order(20, 2, "2024-06-01T00:00:00", 999.0),
        ],
        OD_SCHEMA,
    )
    _write(
        spark,
        tmp_path,
        "events",
        [
            _event(1, "2023-12-31T23:59:59", 1),  # before all orders -> NULLs
            _event(2, "2024-01-01T00:00:00", 1),  # AT build ts -> inclusive
            _event(3, "2024-01-02T12:00:00", 1),  # between -> order 11
            _event(4, "2024-01-04T00:00:00", 1),  # after -> order 12
            _event(5, "2024-01-04T00:00:00", 3),  # user with no orders
        ],
        EV_SCHEMA,
    )
    got = {r["event_id"]: r for r in asof_join_last_order(spark, str(tmp_path)).collect()}
    assert got[1]["last_orderkey"] is None
    assert got[2]["last_orderkey"] == 11 and got[2]["last_totalprice"] == 200.0
    assert got[3]["last_orderkey"] == 11
    assert got[4]["last_orderkey"] == 12 and got[4]["last_totalprice"] == 300.0
    assert got[5]["last_orderkey"] is None


def test_sessionize_gap_rule(spark, tmp_path):
    base = "2024-01-01T00:00:00"
    t0 = _ts(base)
    rows = [
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(seconds=1800), 7, "click", 2.0, "{}"),  # ==1800: same
        (3, t0 + dt.timedelta(seconds=1800 + 1801), 7, "click", 4.0, "{}"),  # >1800: new
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = sessionize_events(spark, str(tmp_path)).orderBy("session_no").collect()
    assert [(r["session_no"], r["n_events"]) for r in got] == [(1, 2), (2, 1)]
    assert got[0]["total_value"] == 3.0


def test_range_join_exact_boundaries(spark, tmp_path):
    e = "2024-01-01T12:00:00"
    rows = [
        _event(100, e, 1, "error"),
        _event(1, e, 2, "purchase"),  # p_ts == e_ts: excluded (strict <)
        _event(2, "2024-01-01T11:50:00", 2, "purchase"),  # == e_ts-600: included
        _event(3, "2024-01-01T11:49:59", 2, "purchase"),  # older: excluded
        _event(4, "2024-01-01T11:55:30", 3, "purchase"),  # inside, other band
        _event(200, "2024-01-01T00:00:00", 1, "error"),  # no purchases near
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {r["event_id"]: r["n_purchases_10m"] for r in range_join_banded(spark, str(tmp_path)).collect()}
    assert got == {100: 2, 200: 0}


def test_asof_bucketed_equals_union_sort(spark, tmp_path):
    """The skew-proof bucketed plan must be value-identical to the
    union-sort plan, including carries across empty buckets: probes
    several buckets after the last build must still see it."""
    bucket_days = ASOF_BUCKET_SEC // 86400
    orders = [
        _order(10, 1, "2020-01-01T00:00:00", 100.0),
        _order(11, 1, "2020-01-01T00:00:00", 200.0),  # tie in one bucket
        _order(12, 1, "2021-06-15T12:00:00", 300.0),
        _order(20, 2, "2019-03-03T00:00:00", 999.0),
    ]
    events = []
    eid = 0
    # probes sweeping many buckets: before, at, between, far after
    for when in (
        "2019-12-31T23:59:59",
        "2020-01-01T00:00:00",
        "2020-05-01T00:00:00",
        "2021-06-15T12:00:00",
        "2024-01-01T00:00:00",  # ~15+ empty buckets after the last build
    ):
        for user in (1, 2, 3):
            eid += 1
            events.append(_event(eid, when, user))
    assert bucket_days < (365 * 4)  # data genuinely spans several buckets
    _write(spark, tmp_path, "orders", orders, OD_SCHEMA)
    _write(spark, tmp_path, "events", events, EV_SCHEMA)
    a = sorted(map(tuple, asof_join_last_order(spark, str(tmp_path)).collect()))
    b = sorted(map(tuple, asof_join_bucketed(spark, str(tmp_path)).collect()))
    assert a == b
    # spot-check the long carry: user 1's 2024 probe sees order 12
    got = {r[0]: r for r in b}
    far = [e for e in events if e[1].year == 2024 and e[2] == 1][0]
    assert got[far[0]][2] == 12


def test_asof_plan_has_no_nested_loop(spark, tmp_path):
    _write(spark, tmp_path, "orders", [_order(1, 1, "2024-01-01T00:00:00", 1.0)], OD_SCHEMA)
    _write(spark, tmp_path, "events", [_event(1, "2024-01-02T00:00:00", 1)], EV_SCHEMA)
    for fn in (asof_join_last_order, range_join_banded):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan, fn.__name__
