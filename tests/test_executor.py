"""Parse-dataset executor: plan execution end-to-end (ref
parse_dataset_folder_logic.py:21-136 + parse_table_definition_logic.py:
148-281 lifecycle; dependency-propagation mirror of ref
tests/ethereumetl_airflow/test_table_definition_reader.py:16-32)."""

import json

import pytest
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.plans.executor import ParseDatasetExecutor
from ethereum_etl_airflow_spark.plans.spec import SqlViewSpec, parse_spec


def _json_spec(table, selector, fields=None, contract=None, dataset="demo"):
    return parse_spec(
        {
            "parser": {
                "type": "log",
                "selector": selector,
                "contract_address": contract,
                "fields": fields
                or [{"name": "k", "path": "$.k", "type": "bigint"}],
            },
            "table": {"dataset_name": dataset, "table_name": table},
        }
    )


def _events(spark, n=400):
    # deterministic little feed shaped like the testdata events table
    rows = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
        F.element_at(
            F.array(F.lit("signup"), F.lit("purchase"), F.lit("click")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("id") * 1.5).alias("value"),
        F.concat(F.lit('{"k": '), (F.col("id") % 50).cast("string"), F.lit("}")).alias(
            "props"
        ),
    )
    return rows


def _dag(with_view=True):
    specs = {
        "demo.signups": _json_spec("signups", "signup"),
        "demo.purchases": _json_spec(
            "purchases", "purchase", contract="ref('demo.signups')"
        ),
        "demo.clicks": _json_spec("clicks", "click"),
        "demo.enriched": _json_spec(
            "enriched", "purchase", contract="ref('demo.clicks')"
        ),
    }
    if with_view:
        specs["demo.purchase_counts"] = SqlViewSpec(
            "demo",
            "purchase_counts",
            "SELECT user_id, COUNT(*) AS n FROM ref('demo.purchases') GROUP BY user_id",
        )
    return specs


class TestDependencyPropagation:
    def test_edit_one_spec_refreshes_exactly_its_dependents(self, spark, tmp_path):
        """Mirror of ref test_table_definition_reader.py:16-32: one
        changed definition marks itself + transitive dependents only."""
        specs = _dag()
        ex = ParseDatasetExecutor(spark, str(tmp_path / "p"), specs)
        first = ex.run(_events(spark), upto_pos=199)
        assert all(v in ("full_refresh", "view") for v in first.values())

        # edit demo.signups: purchases (direct ref) and purchase_counts
        # (view over purchases) must refresh; clicks/enriched must not
        edited = dict(specs)
        edited["demo.signups"] = _json_spec(
            "signups", "signup", fields=[{"name": "k", "path": "$.k", "type": "bigint"},
                                         {"name": "k2", "path": "$.k", "type": "int"}]
        )
        ex2 = ParseDatasetExecutor(spark, str(tmp_path / "p"), edited)
        second = ex2.run(_events(spark), upto_pos=399)
        assert second["demo.signups"] == "full_refresh"
        assert second["demo.purchases"] == "full_refresh"
        assert second["demo.clicks"] == "incremental"
        assert second["demo.enriched"] == "incremental"
        assert second["demo.purchase_counts"] == "view"

    def test_mass_edit_refuses(self, spark, tmp_path):
        specs = _dag(with_view=False)
        ex = ParseDatasetExecutor(spark, str(tmp_path / "p"), specs, max_full_refresh=2)
        with pytest.raises(RuntimeError, match="full refresh"):
            ex.run(_events(spark), upto_pos=99)


class TestIncrementalEquivalence:
    def test_incremental_merge_equals_full_parse(self, spark, tmp_path):
        specs = _dag(with_view=False)
        src = _events(spark)
        ex = ParseDatasetExecutor(spark, str(tmp_path / "p"), specs)
        ex.run(src, upto_pos=149)
        rep = ex.run(src, upto_pos=399)
        assert rep["demo.purchases"] == "incremental"

        got = ex.read("demo.purchases").orderBy("event_id").collect()
        # expected: full parse in one shot into a fresh root
        ex_full = ParseDatasetExecutor(spark, str(tmp_path / "full"), specs)
        ex_full.run(src, upto_pos=399)
        want = ex_full.read("demo.purchases").orderBy("event_id").collect()
        assert got == want and len(got) > 0

    def test_replay_same_pos_is_fenced(self, spark, tmp_path):
        specs = {"demo.signups": _json_spec("signups", "signup")}
        src = _events(spark)
        ex = ParseDatasetExecutor(spark, str(tmp_path / "p"), specs)
        ex.run(src, upto_pos=100)
        n1 = ex.read("demo.signups").count()
        # crash-replay: same upto_pos, fresh executor over the same root
        ex2 = ParseDatasetExecutor(spark, str(tmp_path / "p"), specs)
        rep = ex2.run(src, upto_pos=100)
        assert rep["demo.signups"] == "fenced"
        assert ex2.read("demo.signups").count() == n1

    def test_changed_spec_at_same_pos_is_not_fenced(self, spark, tmp_path):
        """ADVICE r2 (medium): a planner-mandated full refresh of a
        CHANGED spec must not be swallowed by the epoch fence when run()
        re-executes at an unchanged upto_pos — otherwise the history
        keeps old-spec rows forever."""
        specs = {"demo.signups": _json_spec("signups", "signup")}
        src = _events(spark)
        ex = ParseDatasetExecutor(spark, str(tmp_path / "p"), specs)
        ex.run(src, upto_pos=100)
        assert "k2" not in ex.read("demo.signups").columns

        edited = {
            "demo.signups": _json_spec(
                "signups",
                "signup",
                fields=[
                    {"name": "k", "path": "$.k", "type": "bigint"},
                    {"name": "k2", "path": "$.k", "type": "int"},
                ],
            )
        }
        ex2 = ParseDatasetExecutor(spark, str(tmp_path / "p"), edited)
        rep = ex2.run(src, upto_pos=100)  # SAME position, changed spec
        assert rep["demo.signups"] == "full_refresh"
        out = ex2.read("demo.signups")
        assert "k2" in out.columns
        assert out.where(F.col("k2").isNotNull()).count() > 0
        # and the fence still holds for a true replay of the new spec
        ex3 = ParseDatasetExecutor(spark, str(tmp_path / "p"), edited)
        assert ex3.run(src, upto_pos=100)["demo.signups"] == "fenced"

    def test_position_must_advance(self, spark, tmp_path):
        specs = {"demo.signups": _json_spec("signups", "signup")}
        ex = ParseDatasetExecutor(spark, str(tmp_path / "p"), specs)
        ex.run(_events(spark), upto_pos=200)
        with pytest.raises(RuntimeError, match="monotonic"):
            ex.run(_events(spark), upto_pos=100)


class TestSqlViews:
    def test_view_over_materialized_table(self, spark, tmp_path):
        specs = _dag()
        ex = ParseDatasetExecutor(spark, str(tmp_path / "p"), specs)
        ex.run(_events(spark), upto_pos=399)
        view = spark.table("demo__purchase_counts")
        base = ex.read("demo.purchases").groupBy("user_id").count()
        got = {r["user_id"]: r["n"] for r in view.collect()}
        want = {r["user_id"]: r["count"] for r in base.collect()}
        assert got == want and len(got) > 0

    def test_unknown_ref_raises(self, spark, tmp_path):
        specs = {
            "demo.v": SqlViewSpec("demo", "v", "SELECT * FROM ref('demo.absent')")
        }
        ex = ParseDatasetExecutor(spark, str(tmp_path / "p"), specs)
        with pytest.raises(ValueError, match="unknown spec"):
            ex.run(_events(spark), upto_pos=10)


class TestStitch:
    def test_stitch_serves_history_union_live(self, spark, tmp_path):
        specs = {"demo.signups": _json_spec("signups", "signup")}
        src = _events(spark)
        ex = ParseDatasetExecutor(spark, str(tmp_path / "p"), specs)
        ex.run(src, upto_pos=149)  # history covers only the first slice
        stitched = ex.stitch("demo.signups", src).orderBy("event_id").collect()
        # equivalent to parsing everything directly
        from ethereum_etl_airflow_spark.plans.compiler import compile_spec

        want = (
            compile_spec(specs["demo.signups"], src).orderBy("event_id").collect()
        )
        assert stitched == want and len(stitched) > 0


class TestHexSpecInExecutor:
    def test_hex_spec_materializes_and_feeds_sql_view(self, spark, tmp_path):
        """A hex-ABI spec runs through the same planner/executor
        lifecycle as JSON specs, and a SQL view consumes its output."""
        from ethereum_etl_airflow_spark.plans.spec import SqlViewSpec

        hex_spec = parse_spec(
            {
                "parser": {
                    "type": "log",
                    "encoding": "hex",
                    "selector": "0xsel",
                    "contract_address": None,
                    "fields": [
                        {"name": "who", "abi_type": "address", "indexed": True},
                        {"name": "amount", "abi_type": "uint32"},
                    ],
                },
                "table": {"dataset_name": "demo", "table_name": "hex_transfers"},
            }
        )
        specs = {
            "demo.hex_transfers": hex_spec,
            "demo.amounts": SqlViewSpec(
                "demo",
                "amounts",
                "SELECT who, SUM(amount) AS total FROM ref('demo.hex_transfers') GROUP BY who",
            ),
        }
        src = _events(spark, n=100).select(
            "event_id", "ts", "user_id",
            F.lpad(F.lower(F.conv(F.col("event_id").cast("string"), 10, 16)), 64, "0").alias("data"),
            F.array(
                F.lit("0xsel"),
                F.lpad(F.substring(F.md5(F.col("user_id").cast("string")), 1, 40), 64, "0"),
            ).alias("topics"),
        )
        ex = ParseDatasetExecutor(spark, str(tmp_path / "p"), specs)
        report = ex.run(src, upto_pos=99)
        assert report["demo.hex_transfers"] == "full_refresh"
        assert report["demo.amounts"] == "view"
        rows = ex.read("demo.hex_transfers")
        assert rows.count() == 100
        got = {r["who"]: r["total"] for r in spark.table("demo__amounts").collect()}
        want = {
            r["who"]: r["s"]
            for r in rows.groupBy("who").agg(F.sum("amount").alias("s")).collect()
        }
        assert got == want and len(got) == 7  # 7 distinct user_ids
