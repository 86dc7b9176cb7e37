"""Guard: every registered oracle must emit only driver-portable types.

The round-4 official CORRECTNESS run failed two queries on hash-only
(`corpus_pack_sequences`, `bpe_learn_merges`) because DuckDB `SUM` over
BIGINT returns HUGEINT, and the real driver canonicalizes a HUGEINT
differently from the BIGINT the Spark side emits (rows and schema still
match, the value hash doesn't).  The engine-side values were correct —
the defect lived entirely in the ORACLE's output typing.

This test closes the class: DESCRIBE every oracle (no execution) and
assert the output column types stay inside the whitelist both engines
collect identically.  HUGEINT/UHUGEINT (DuckDB-only 128-bit ints) and
DECIMAL (engine-dependent fetch representation) are banned — cast to
BIGINT / DOUBLE at the oracle's final projection instead, mirroring the
repo float discipline: aggregate exactly, EMIT portable.
"""

from __future__ import annotations

import re

import pytest

from ethereum_etl_airflow_spark import queries as q

from tests.conftest import SF_ORACLE
from tests.oracle_harness import duckdb_conn

#: DuckDB output types whose Python fetch representation is identical
#: to the matching Spark collect() representation (driver-portable).
_PORTABLE = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BLOB",
}

_LIST = re.compile(r"^(.+)\[\]$")


def _portable(ty: str) -> bool:
    ty = ty.strip().upper()
    m = _LIST.match(ty)
    if m:  # element type of a list must itself be portable
        return _portable(m.group(1))
    return ty in _PORTABLE


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_ORACLE)
    yield c
    c.close()


def _described(con):
    out = {}
    for name, sql in q.get_oracles().items():
        out[name] = con.execute(f"DESCRIBE {sql}").fetchall()
    return out


def test_no_oracle_emits_nonportable_types(con):
    offenders = {}
    for name, desc in _described(con).items():
        bad = [(c, ty) for c, ty, *_ in desc if not _portable(ty)]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting driver-nonportable output types (cast the "
        f"final projection to BIGINT/DOUBLE): {offenders}"
    )


def test_every_oracle_describes(con):
    """DESCRIBE itself must succeed for every oracle (syntactic gate —
    a broken oracle should fail here, not first in the driver)."""
    descs = _described(con)
    assert len(descs) == len(q.get_oracles())
    assert all(descs.values())
