"""Every REGISTRY query with an oracle must match DuckDB at sf0.01.

Mirror of the driver's CORRECTNESS gate (see __spark_entry__.py
docstring) so regressions are caught pre-round.
"""

from __future__ import annotations

import pytest

from ethereum_etl_airflow_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

ORACLE_CASES = [name for name, spec in REGISTRY.items() if spec.oracle]


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, name):
    spec = REGISTRY[name]
    # lazy oracles are zero-arg callables (audits composing other
    # registered oracles) — resolve exactly like the driver's
    # get_oracles() does
    oracle = spec.oracle() if callable(spec.oracle) else spec.oracle
    ok, msg = compare(spark, SF_ORACLE, spec.spark_fn, oracle)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


class TestCosinePlanIsDistributed:
    """The near-dup cosine pipeline must be fully distributed: building
    the DataFrame triggers no driver-side collect of the embedding
    table, and the physical plan is cogrouped Arrow execution — not a
    broadcast of locally-collected rows (round-1 weakness)."""

    def test_no_collect_in_pipeline(self, spark, monkeypatch):
        sf_dir = "/root/testdata/sf0.001"
        from pyspark.sql import DataFrame

        from ethereum_etl_airflow_spark.functions.similarity import (
            dedup_embedding_cosine,
            dedup_embedding_cosine_lsh,
        )

        def banned(self, *a, **k):
            raise AssertionError("driver-side collect() in cosine pipeline")

        monkeypatch.setattr(DataFrame, "collect", banned)
        df = dedup_embedding_cosine(spark, sf_dir)
        df_lsh = dedup_embedding_cosine_lsh(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapCoGroupsInPandas" in plan
        assert "Broadcast" not in plan.split("FlatMapCoGroupsInPandas")[0].split("\n")[0]
        plan_lsh = df_lsh._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" in plan_lsh
