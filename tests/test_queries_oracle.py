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
    ok, msg = compare(spark, SF_ORACLE, spec.spark_fn, spec.oracle)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
