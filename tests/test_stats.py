"""Exact per-group quantiles: edge cases the sf0.01 oracle can't reach.

The oracle query (`events_exact_quantiles`) covers the happy path at
scale; these tests pin the boundary semantics: rank collisions in tiny
groups (two quantiles on one rank -> two rows), all-equal values
(degenerate single bucket), duplicate-heavy data, and exactness vs a
brute-force sorted pick.
"""

from __future__ import annotations

import math

import pytest

from ethereum_etl_airflow_spark.functions.stats import (
    QUANTILES,
    exact_group_quantiles,
)


def brute(rows, quantiles):
    """Reference semantics: value at 1-indexed rank ceil(q*n) per group."""
    by_g: dict = {}
    for g, v in rows:
        if v is not None:
            by_g.setdefault(g, []).append(v)
    out = set()
    for g, vs in by_g.items():
        vs.sort()
        for q in quantiles:
            rank = max(1, int(math.ceil(q * len(vs))))
            out.add((g, q, vs[rank - 1]))
    return out


def run(spark, rows, quantiles=QUANTILES, **kw):
    df = spark.createDataFrame(rows, schema="g string, v double")
    got = exact_group_quantiles(df, "g", "v", quantiles, **kw)
    return {(r["g"], r["q"], r["value"]) for r in got.collect()}


def test_matches_bruteforce_on_random_groups(spark):
    import random

    rng = random.Random(7)
    rows = [
        (f"g{i % 3}", round(rng.uniform(-100, 100), 3)) for i in range(500)
    ]
    assert run(spark, rows) == brute(rows, QUANTILES)


def test_rank_collision_emits_row_per_quantile(spark):
    # n=2: ceil(.25*2)=1, ceil(.5*2)=1 -> SAME rank, two output rows
    rows = [("a", 1.0), ("a", 2.0)]
    got = run(spark, rows, quantiles=(0.25, 0.5, 0.99))
    assert got == {("a", 0.25, 1.0), ("a", 0.5, 1.0), ("a", 0.99, 2.0)}


def test_all_equal_values_single_bucket(spark):
    rows = [("a", 5.0)] * 40 + [("b", 1.0), ("b", 2.0), ("b", 3.0)]
    assert run(spark, rows) == brute(rows, QUANTILES)


def test_duplicate_heavy_values(spark):
    rows = [("a", float(v)) for v in [1, 1, 1, 1, 2, 2, 3, 3, 3, 3, 3, 9]]
    assert run(spark, rows) == brute(rows, QUANTILES)


def test_nulls_ignored_and_few_buckets(spark):
    rows = [("a", float(i)) for i in range(100)] + [("a", None)] * 5
    # num_buckets smaller than the group forces multi-row buckets
    assert run(spark, rows, num_buckets=3) == brute(rows, QUANTILES)


def test_empty_input_yields_empty(spark):
    df = spark.createDataFrame([], schema="g string, v double")
    out = exact_group_quantiles(df, "g", "v", QUANTILES)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["g", "q", "value"]


def test_more_buckets_than_rows(spark):
    rows = [("a", 3.0), ("a", 1.0), ("a", 2.0)]
    assert run(spark, rows, num_buckets=64) == brute(rows, QUANTILES)


@pytest.mark.parametrize("q", [0.0001, 1.0])
def test_extreme_quantiles_clamp_to_valid_ranks(spark, q):
    rows = [("a", float(i)) for i in range(10)]
    got = run(spark, rows, quantiles=(q,))
    rank = max(1, int(math.ceil(q * 10)))
    assert got == {("a", q, float(rank - 1))}
