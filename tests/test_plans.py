"""Extraction-spec subsystem tests — mirror of the reference's
test_parse.py (golden compile), test_validate_json.py (spec
validation), and test_table_definition_reader.py (toposort + hash-diff
propagation)."""

from __future__ import annotations

import pytest

from ethereum_etl_airflow_spark.plans.compiler import compile_spec, compile_spec_pandas
from ethereum_etl_airflow_spark.plans.planner import (
    CycleError,
    PlannerState,
    commit_plan,
    plan,
    toposort,
    transitive_dependents,
)
from ethereum_etl_airflow_spark.plans.spec import SpecValidationError, parse_spec

SF = "/root/testdata/sf0.001"


def mk_spec(name, selector="purchase", contract=None, dataset="d"):
    return parse_spec(
        {
            "parser": {
                "type": "log",
                "selector": selector,
                "contract_address": contract,
                "fields": [{"name": "k", "path": "$.k", "type": "bigint"}],
            },
            "table": {"dataset_name": dataset, "table_name": name},
        }
    )


# ------------------------------------------------------------- validation


def test_spec_validation_errors():
    with pytest.raises(SpecValidationError, match="missing top-level"):
        parse_spec({"parser": {}})
    with pytest.raises(SpecValidationError, match="log|trace"):
        parse_spec({"parser": {"type": "xxx", "selector": "s"}, "table": {}})
    with pytest.raises(SpecValidationError, match="duplicate field"):
        parse_spec(
            {
                "parser": {
                    "type": "log",
                    "selector": "s",
                    "fields": [
                        {"name": "a", "type": "bigint"},
                        {"name": "a", "type": "string"},
                    ],
                },
                "table": {"dataset_name": "d", "table_name": "t"},
            }
        )
    with pytest.raises(SpecValidationError, match="!= file name"):
        mk = {
            "parser": {"type": "log", "selector": "s", "fields": []},
            "table": {"dataset_name": "d", "table_name": "t"},
        }
        parse_spec(mk, expected_name="other")


def test_refs_extracted():
    s = mk_spec("t", contract="SELECT addr FROM ref('base') WHERE x")
    assert s.refs == ("base",)
    assert mk_spec("t").refs == ()


# --------------------------------------------------------------- toposort


def test_toposort_orders_dependencies_first():
    specs = {
        "c": mk_spec("c", contract="ref('b')"),
        "b": mk_spec("b", contract="ref('a')"),
        "a": mk_spec("a"),
        "x": mk_spec("x"),
    }
    order = toposort(specs)
    assert order.index("a") < order.index("b") < order.index("c")
    assert sorted(order) == ["a", "b", "c", "x"]


def test_toposort_cycle_detected():
    specs = {
        "a": mk_spec("a", contract="ref('b')"),
        "b": mk_spec("b", contract="ref('a')"),
    }
    with pytest.raises(CycleError):
        toposort(specs)


def test_transitive_dependent_propagation():
    """Marking one spec updated must mark exactly its transitive
    dependents (mirror of test_table_definition_reader.py:16-32)."""
    specs = {
        "a": mk_spec("a"),
        "b": mk_spec("b", contract="ref('a')"),
        "c": mk_spec("c", contract="ref('b')"),
        "z": mk_spec("z"),
    }
    assert transitive_dependents(specs, {"a"}) == {"a", "b", "c"}
    assert transitive_dependents(specs, {"b"}) == {"b", "c"}
    assert transitive_dependents(specs, {"z"}) == {"z"}


# ---------------------------------------------------------------- planner


def test_plan_hash_diff_modes(tmp_path):
    state = PlannerState(str(tmp_path / "state.json"))
    specs = {
        "a": mk_spec("a"),
        "b": mk_spec("b", contract="ref('a')"),
    }
    # first run: everything is new -> full refresh
    p1 = plan(specs, state)
    assert all(e.mode == "full_refresh" for e in p1)
    commit_plan(specs, state, last_pos=1)
    # unchanged second run: all incremental
    p2 = plan(specs, state)
    assert all(e.mode == "incremental" for e in p2)
    # change a -> a and its dependent b refresh
    specs2 = {"a": mk_spec("a", selector="click"), "b": specs["b"]}
    p3 = {e.name: e.mode for e in plan(specs2, state)}
    assert p3 == {"a": "full_refresh", "b": "full_refresh"}


def test_plan_guard_on_mass_refresh(tmp_path):
    state = PlannerState(str(tmp_path / "state.json"))
    specs = {f"t{i}": mk_spec(f"t{i}") for i in range(5)}
    with pytest.raises(RuntimeError, match="full refresh"):
        plan(specs, state, max_full_refresh=3)


def test_state_optimistic_lock(tmp_path):
    state = PlannerState(str(tmp_path / "state.json"))
    st = state.load()
    state.save(dict(st), expected_version=0)
    with pytest.raises(RuntimeError, match="optimistic lock"):
        state.save(dict(st), expected_version=0)  # stale version


def test_commit_plan_monotone_position(tmp_path):
    state = PlannerState(str(tmp_path / "state.json"))
    specs = {"a": mk_spec("a")}
    commit_plan(specs, state, last_pos=5)
    with pytest.raises(RuntimeError, match="monotonically"):
        commit_plan(specs, state, last_pos=3)


# ------------------------------------------------------------- compile


def test_compile_spec_matches_manual_pipeline(spark):
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = compile_spec(mk_spec("purchase_events"), ev)
    assert out.columns == ["event_id", "ts", "user_id", "k"]
    want = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "event_id", "ts", "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
    )
    assert out.exceptAll(want).count() == 0 and want.exceptAll(out).count() == 0


def test_compile_pandas_parity_with_jvm_path(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    spec = mk_spec("purchase_events")
    jvm = compile_spec(spec, ev)
    pnd = compile_spec_pandas(spec, ev)
    assert jvm.schema == pnd.schema
    assert jvm.exceptAll(pnd).count() == 0 and pnd.exceptAll(jvm).count() == 0


def test_compile_error_column_keeps_bad_rows(spark):
    """Trace-style decode: malformed payloads keep their row with the
    error column filled (parse_traces_udf.sql:24-27), instead of the
    log-style drop."""
    import pyspark.sql.functions as F

    rows = [
        (1, "2024-01-01 00:00:00", 10, "purchase", '{"k": 5}'),
        (2, "2024-01-01 00:00:01", 11, "purchase", "THIS IS NOT JSON"),
        (3, "2024-01-01 00:00:02", 12, "click", '{"k": 7}'),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, props string"
    ).select("event_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "user_id", "event_type", "props")
    spec = mk_spec("t")
    dropped = compile_spec(spec, ev)
    kept = compile_spec(spec, ev, error_column=True)
    assert dropped.count() == 1  # log style: bad row gone
    out = {r.event_id: (r.k, r.error) for r in kept.collect()}
    assert out[1] == (5, None)
    assert out[2][0] is None and "parse failure" in out[2][1]
    assert 3 not in out  # selector filter still applies


def test_compile_selector_filter_pushed_down(spark):
    """The selector predicate must reach the parquet scan (SURVEY §4
    pushdown requirement) — visible as PushedFilters in the plan."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = compile_spec(mk_spec("purchase_events"), ev)
    plan_str = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan_str and "event_type" in plan_str
