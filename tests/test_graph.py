"""Connected components: star-contraction vs brute-force union-find."""

from __future__ import annotations

import random

import pytest

from ethereum_etl_airflow_spark.functions.graph import connected_components


def union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def run(spark, edges):
    df = spark.createDataFrame(edges, schema="a bigint, b bigint")
    got = connected_components(df, "a", "b")
    return {r["node"]: r["cluster"] for r in got.collect()}


def test_two_disjoint_pairs(spark):
    assert run(spark, [(1, 2), (10, 11)]) == {1: 1, 2: 1, 10: 10, 11: 10}


def test_long_chain_needs_multiple_rounds(spark):
    # path 0-1-2-...-40: naive propagation would need 40 rounds;
    # star contraction must still resolve (and in far fewer)
    edges = [(i, i + 1) for i in range(40)]
    assert run(spark, edges) == {i: 0 for i in range(41)}


def test_chain_reversed_ids(spark):
    # min id at the FAR end of the chain
    edges = [(i + 1, i) for i in range(30, 0, -1)]
    assert run(spark, edges) == {i: 1 for i in range(1, 32)}


def test_cycle_and_bridge(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (7, 8), (8, 9)]
    assert run(spark, edges) == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7, 9: 7}


def test_self_loops_ignored(spark):
    got = run(spark, [(5, 5), (1, 2)])
    assert got == {1: 1, 2: 1}  # pure self-loop node drops out


def test_duplicate_and_reversed_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (2, 3)]
    assert run(spark, edges) == {1: 1, 2: 1, 3: 1}


@pytest.mark.parametrize("seed", [11, 23])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(120), rng.randrange(120)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert run(spark, edges) == union_find(edges)


def test_empty_edges(spark):
    df = run(spark, [])
    assert df == {}


def test_star_graph_single_round_shape(spark):
    edges = [(0, i) for i in range(1, 20)]
    assert run(spark, edges) == {i: 0 for i in range(20)}
