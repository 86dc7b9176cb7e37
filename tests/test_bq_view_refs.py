"""Backticked parse-table references inside SQL views.

The reference's 19 corpus views reference sibling parse outputs in the
PRE-EXPANDED form its own ``replace_refs`` emits —
``\\`<project>.ethereum_<dataset>.<table>\\``
(parse_table_definition_logic.py:409-413) — not via ``ref('X')``.
The engine treats both as the same dependency edge: ``SqlViewSpec.refs``
extracts them, toposort orders them, and ``_create_view`` substitutes
the resolved upstream temp view. Raw-chain tables
(``bigquery-public-data.crypto_ethereum.*``) and UDF references carry
no ``ethereum_`` dataset prefix and are intentionally left alone.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from ethereum_etl_airflow_spark.plans.executor import ParseDatasetExecutor
from ethereum_etl_airflow_spark.plans.planner import toposort
from ethereum_etl_airflow_spark.plans.spec import SqlViewSpec, parse_spec

DEFS = "/root/reference/dags/resources/stages/parse/table_definitions"


def test_refs_extracts_backtick_parse_tables():
    v = SqlViewSpec(
        "compound",
        "combined",
        "SELECT a FROM `blockchain-etl.ethereum_compound.cToken_event_X`\n"
        "UNION ALL SELECT a FROM `blockchain-etl.ethereum_compound.cUSDC_event_X`\n"
        "JOIN `bigquery-public-data.crypto_ethereum.blocks` USING (n)\n"
        "WHERE f(`blockchain-etl-internal.common.normalize_trace_address`(x))\n"
        "AND g(ref('other_table'))",
    )
    assert v.refs == (
        "other_table",
        "compound.cToken_event_X",
        "compound.cUSDC_event_X",
    )


@pytest.mark.skipif(
    not os.path.isdir(DEFS), reason="reference table_definitions not present"
)
def test_real_compound_view_refs_resolve_in_dataset():
    path = os.path.join(DEFS, "compound", "cToken_event_AccrueInterest_combined.sql")
    with open(path) as f:
        v = SqlViewSpec("compound", "cToken_event_AccrueInterest_combined", f.read())
    assert len(v.refs) == 8  # cToken + 7 per-market variants
    assert all(r.startswith("compound.") for r in v.refs)


def _spec(table, selector, dataset="demo"):
    return parse_spec(
        {
            "parser": {
                "type": "log",
                "selector": selector,
                "contract_address": None,
                "fields": [{"name": "k", "path": "$.k", "type": "bigint"}],
            },
            "table": {"dataset_name": dataset, "table_name": table},
        }
    )


def test_view_over_backtick_refs_executes(spark, tmp_path):
    """A view unioning two parse outputs through backticked names runs
    through the executor exactly like a ref() view — and toposort
    orders it after both."""
    specs = {
        "demo.signups": _spec("signups", "signup"),
        "demo.clicks": _spec("clicks", "click"),
        "demo.all_k": SqlViewSpec(
            "demo",
            "all_k",
            "SELECT k FROM `blockchain-etl.ethereum_demo.signups` "
            "UNION ALL "
            "SELECT k FROM `blockchain-etl.ethereum_demo.clicks`",
        ),
    }
    order = toposort(specs)
    assert order.index("demo.all_k") == 2

    feed = spark.range(40).select(
        F.col("id").alias("event_id"),
        F.lit(0).alias("ts"),
        F.lit("0x" + "aa" * 20).alias("user_id"),
        F.when(F.col("id") % 2 == 0, "signup").otherwise("click").alias(
            "event_type"
        ),
        F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}")).alias(
            "props"
        ),
    )
    ex = ParseDatasetExecutor(spark, str(tmp_path / "ds"), specs)
    report = ex.run(feed, upto_pos=40)
    assert report["demo.all_k"] == "view"
    ks = [r["k"] for r in spark.table("demo__all_k").collect()]
    assert sorted(ks) == list(range(40))


def test_view_with_unresolved_backtick_ref_fails_loudly(spark, tmp_path):
    specs = {
        "demo.signups": _spec("signups", "signup"),
        "demo.v": SqlViewSpec(
            "demo",
            "v",
            "SELECT k FROM `blockchain-etl.ethereum_other.absent_table`",
        ),
    }
    feed = spark.createDataFrame(
        [], "event_id long, ts long, user_id string, event_type string, props string"
    )
    ex = ParseDatasetExecutor(spark, str(tmp_path / "ds"), specs)
    with pytest.raises(ValueError, match="unknown spec 'other.absent_table'"):
        ex.run(feed, upto_pos=0)
