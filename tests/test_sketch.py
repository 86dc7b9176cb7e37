"""Property tests for the sketch operators (functions/sketch.py) and
the Z-order layout key (functions/layout.py).

The driver-style oracle equality is covered by test_queries_oracle;
these tests pin the SEMANTIC guarantees the oracle can't express:
CMS one-sidedness, the HLL error bound, surprisal monotonicity, and
Morton-curve bijectivity.
"""

from __future__ import annotations

from conftest import SF_ORACLE

from ethereum_etl_airflow_spark.functions.layout import Z_BITS, zvalue_sql
from ethereum_etl_airflow_spark.functions.sketch import (
    HLL_M,
    approx_distinct_hll,
    sketch_cms_heavy_hitters,
    text_unigram_surprisal,
)
from ethereum_etl_airflow_spark.functions.layout import zorder_layout_key


def test_cms_never_undercounts(spark):
    rows = sketch_cms_heavy_hitters(spark, SF_ORACLE).collect()
    assert len(rows) == 150
    for r in rows:
        assert r.cms_est >= r.exact_cnt, "CMS error must be one-sided"
        assert r.overcount == r.cms_est - r.exact_cnt
    # with 150 keys in 256 buckets some collisions must actually occur,
    # otherwise the test data exercises nothing
    assert any(r.overcount > 0 for r in rows)


def test_hll_error_within_bound(spark):
    row = approx_distinct_hll(spark, SF_ORACLE).collect()[0]
    assert row.regs_used <= HLL_M
    # standard error is ~1.04/sqrt(m) = 13% at m=64; allow 3 sigma
    rel_err = abs(row.est_hll - row.exact_distinct) / row.exact_distinct
    assert rel_err < 3 * 1.04 / (HLL_M**0.5), (row.est_hll, row.exact_distinct)


def test_surprisal_bits_consistent(spark):
    rows = text_unigram_surprisal(spark, SF_ORACLE).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.n_tokens > 0
        assert 0 <= r.sum_bits
        assert abs(r.mean_bits - r.sum_bits / r.n_tokens) < 1e-12
        # every token's surprisal is < 60 bits on a 60-bit-hash corpus
        assert r.mean_bits < 60


def _deinterleave(z: int) -> tuple[int, int]:
    x = y = 0
    for b in range(Z_BITS):
        x |= ((z >> (2 * b)) & 1) << b
        y |= ((z >> (2 * b + 1)) & 1) << b
    return x, y


def test_zvalue_is_bijective(spark):
    rows = zorder_layout_key(spark, SF_ORACLE).collect()
    assert len(rows) == 10000
    for r in rows[:500]:
        assert _deinterleave(r.zval) == (r.x, r.y)
        assert r.zbucket == r.zval >> 24


def test_zvalue_sql_fragment_matches_python():
    import duckdb

    frag = zvalue_sql("x", "y")
    got = duckdb.sql(
        f"SELECT {frag} AS z FROM (SELECT 41 AS x, 2026 AS y)"
    ).fetchone()[0]
    want = 0
    for b in range(Z_BITS):
        want |= ((41 >> b) & 1) << (2 * b)
        want |= ((2026 >> b) & 1) << (2 * b + 1)
    assert got == want
