"""Invariant tests for the embedding-compression family
(functions/quantize.py). Oracle equality is covered by the driver
contract; these pin the algebraic properties that equality alone
wouldn't localize if they broke."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.quantize import (
    KM_K,
    PQ_K,
    PQ_M,
    QMAX,
    ann_pq_encode,
    embedding_quantize_int8,
    kmeans_assign_iter,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q8(spark):
    return embedding_quantize_int8(spark, SF).cache()


def test_int8_codes_in_range(spark, q8):
    bad = q8.where(
        F.exists("codes", lambda c: (c > QMAX) | (c < -QMAX))
    ).count()
    assert bad == 0


def test_int8_absmax_element_saturates(spark, q8):
    """The element that set the scale must encode to exactly +-QMAX
    (+QMAX if it was the max, -QMAX only when x == -amax exactly)."""
    n = q8.where(~F.array_contains(F.transform("codes", F.abs), QMAX)).count()
    assert n == 0


def test_int8_mse_nonneg_and_small(spark, q8):
    """Quantization error per element is < 1 scale step, so the MSE is
    bounded by (1/QMAX)^2 in the unscaled space."""
    row = q8.agg(F.min("mse").alias("lo"), F.max("mse").alias("hi")).first()
    assert row["lo"] >= 0.0
    assert row["hi"] < (1.0 / QMAX) ** 2


def test_pq_seed_vectors_zero_distortion(spark):
    """Each codebook seed vector k < PQ_K must encode to its own id in
    every subspace with zero distortion."""
    enc = ann_pq_encode(spark, SF)
    seeds = enc.where(F.col("vec_id") < PQ_K).collect()
    assert len(seeds) == PQ_K
    for r in seeds:
        assert r["distortion"] == 0
        assert r["codes"] == [r["vec_id"]] * PQ_M


def test_kmeans_seed_in_own_cluster(spark):
    """Seed k sits at distance 0 from centroid k, so cluster k must be
    non-empty and its recomputed centroid stays finite."""
    it = kmeans_assign_iter(spark, SF)
    rows = it.collect()
    clusters = {r["cluster_id"] for r in rows}
    assert clusters == set(range(KM_K)) & clusters  # subset of valid ids
    assert all(r["n_members"] >= 1 for r in rows)
    # every cluster that appears has exactly DIM dim-rows
    from collections import Counter

    per = Counter(r["cluster_id"] for r in rows)
    assert all(v == 64 for v in per.values())
