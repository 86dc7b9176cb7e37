"""Embedding compression for the training-data pipeline: int8 scalar
quantization (storage/bandwidth), product quantization (the ANN
codebook path — Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011), and one exact Lloyd k-means iteration
(the codebook-training / data-curation clustering step).

The reference pipeline has no vector stage (it stops at decoded event
tables — dags/ethereumetl_airflow/build_parse_dag.py); a 100 TB corpus
engine stores embeddings for dedup/search, and at 10^9+ vectors the
raw float32 matrix is the dominant byte cost — quantization is what
makes the ANN index (ann_ivf_probed / ann_lsh_bucketed) fit a cluster.

Numeric discipline (veclib.py): embeddings scale to exact int64
(`floor(x * 1e6)`); every distance/assignment decision is 64-bit-
integer exact and bit-identical to the DuckDB oracle; doubles appear
only in final single-division outputs (IEEE-identical operand order).

Scale notes (100 TB / 10^9 vectors):
* int8 quantize: pure narrow map — zero shuffles at any scale; 4x
  byte reduction before the vectors ever hit a shuffle or an index.
* PQ encode: the codebook is BOUNDED (M*K subvector centroids), so it
  rides the plan as literals (same bounded-broadcast discipline as
  corpus_tokenize_vocab's vocab MAP) and encode is again a zero-
  shuffle scan-project; 64 dims of float32 become M=8 bytes.
* k-means iteration: assignment is narrow (literal centroids); the
  recompute is ONE shuffle of K x (DIM+1) partial sums per partition
  (64 `sum(element_at(iv, i))` aggregates — map-side combined, never
  an explode of N*DIM rows, which at 10^9 x 64 would shuffle 6.4e10
  rows for the same K x DIM result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.veclib import (
    DIM,
    SCALE,
    _IVEC_SQL,
    int_vec,
)
from ethereum_etl_airflow_spark.queries import _t, register

#: int8 code range: codes in [-QMAX, QMAX]
QMAX = 127

#: mse denominator: err is in units of QMAX*SCALE, averaged over DIM
_MSE_DEN = float(DIM * (QMAX * SCALE) ** 2)

#: product quantization: M subspaces of SUBDIM dims, K centroids each
PQ_M = 8
PQ_SUBDIM = DIM // PQ_M
PQ_K = 8

#: k-means clusters (centroids seeded from vec_id < KM_K)
KM_K = 8


@register(
    "embedding_quantize_int8",
    oracle=f"""
    WITH t AS (
        SELECT vec_id, {_IVEC_SQL} AS iv FROM embeddings
    ), q AS (
        SELECT vec_id, iv,
               GREATEST(1, list_max(list_transform(iv, x -> abs(x)))) AS amax
        FROM t
    ), c AS (
        SELECT vec_id, amax,
               list_transform(iv,
                   x -> CAST(floor((x * {QMAX})::DOUBLE / amax) AS INT)) AS codes,
               list_transform(iv,
                   x -> {QMAX} * x
                        - CAST(floor((x * {QMAX})::DOUBLE / amax) AS BIGINT) * amax
               ) AS err
        FROM q
    )
    SELECT vec_id, amax, codes,
           (list_sum(list_transform(err, e -> e * e))::DOUBLE) / {_MSE_DEN!r} AS mse
    FROM c
    """,
    doc=f"symmetric int8 scalar quantization of embedding vectors "
    f"(per-vector absmax scale, codes in [-{QMAX}, {QMAX}]) with an "
    "exact-integer reconstruction-MSE audit",
    survey_ref="training-pipeline ops: embedding storage compression — "
    "the byte-budget prerequisite for ann_ivf_probed at 10^9 vectors",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Everything runs in the exact-int space: the scale is the integer
    absmax, codes are `floor(x*127/amax)` (the double division is one
    exactly-rounded IEEE op — both engines agree bit-for-bit), and the
    reconstruction error `127*x - code*amax` stays integer, so the MSE
    is a single exact-int sum divided once. Plan: one scan, zero
    shuffles — a pure per-row map at any corpus size."""
    iv = int_vec()
    q = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        iv.alias("iv"),
        F.greatest(
            F.lit(1).cast("long"),
            F.array_max(F.transform(iv, F.abs)),
        ).alias("amax"),
    )
    code = lambda x: F.floor(  # noqa: E731
        (x * QMAX).cast("double") / F.col("amax")
    )
    c = q.select(
        "vec_id",
        "amax",
        F.transform(F.col("iv"), lambda x: code(x).cast("int")).alias("codes"),
        F.transform(
            F.col("iv"),
            lambda x: QMAX * x - code(x).cast("long") * F.col("amax"),
        ).alias("err"),
    )
    sq_sum = F.aggregate(
        F.col("err"), F.lit(0).cast("long"), lambda acc, e: acc + e * e
    )
    return c.select(
        "vec_id",
        "amax",
        "codes",
        (sq_sum.cast("double") / F.lit(_MSE_DEN)).alias("mse"),
    )


def _collect_seed_ivecs(spark: SparkSession, sf_dir: str, k: int) -> list[list[int]]:
    """Integer-scaled seed vectors (vec_id < k) — a BOUNDED collect (k
    rows) in the corpus_tokenize_vocab discipline; parquet float32
    widens exactly to double in both Arrow and the JVM, so the Python
    floor matches the engines' floor bit-for-bit."""
    import math

    rows = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    return [
        [int(math.floor(float(x) * SCALE)) for x in r["embedding"]] for r in rows
    ]


def _lit_vec(vals: list[int]) -> F.Column:
    return F.array(*[F.lit(v).cast("long") for v in vals])


def _l2_int(a: F.Column, b: F.Column) -> F.Column:
    """Exact-int squared L2 distance between two int64 arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


@register(
    "ann_pq_encode",
    oracle=f"""
    WITH t AS (
        SELECT vec_id, {_IVEC_SQL} AS iv FROM embeddings
    ), sub AS (
        SELECT vec_id, m,
               iv[m * {PQ_SUBDIM} + 1 : m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sv
        FROM t, unnest(range(0, {PQ_M})) AS u(m)
    ), cb AS (
        SELECT CAST(vec_id AS INT) AS k, m, sv AS cv
        FROM sub WHERE vec_id < {PQ_K}
    ), d AS (
        SELECT s.vec_id, s.m, c.k,
               list_sum(list_transform(range(1, {PQ_SUBDIM} + 1),
                   i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])))::BIGINT AS dist,
               ROW_NUMBER() OVER (
                   PARTITION BY s.vec_id, s.m
                   ORDER BY list_sum(list_transform(range(1, {PQ_SUBDIM} + 1),
                       i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))), c.k
               ) AS rn
        FROM sub s JOIN cb c USING (m)
    )
    SELECT vec_id,
           list(k ORDER BY m) AS codes,
           SUM(dist)::BIGINT AS distortion
    FROM d WHERE rn = 1
    GROUP BY vec_id
    """,
    doc=f"product-quantization encode: {PQ_M} subspaces x {PQ_SUBDIM} dims, "
    f"{PQ_K} centroids each (codebook = subvectors of the first {PQ_K} "
    "vectors), exact-int nearest-centroid codes + total distortion",
    survey_ref="training-pipeline ops: the PQ codebook path that turns "
    f"{DIM} float32 dims into {PQ_M} bytes for cluster-resident ANN "
    "(pairs with ann_ivf_probed's coarse quantizer)",
)
def ann_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The codebook (M*K subvector centroids) is collected once —
    bounded by construction — and rides the encode plan as literal
    arrays, so the encode is a ZERO-shuffle scan-project: per row, M
    argmins over K exact-int subvector distances (first-min tiebreak =
    smallest centroid id, matching the oracle's (dist, k) window
    order). At 10^9 vectors this plan encodes the corpus in one narrow
    pass; a join-against-codebook formulation would shuffle N*M rows
    to move a kilobyte of centroids."""
    seeds = _collect_seed_ivecs(spark, sf_dir, PQ_K)
    # codebook[m][k] = centroid subvector (list of ints)
    codebook = [
        [seeds[k][m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM] for k in range(PQ_K)]
        for m in range(PQ_M)
    ]
    t = _t(spark, sf_dir, "embeddings").select("vec_id", int_vec().alias("iv"))

    def sub(m: int) -> F.Column:
        return F.slice(F.col("iv"), m * PQ_SUBDIM + 1, PQ_SUBDIM)

    def dists(m: int) -> F.Column:
        return F.array(*[_l2_int(sub(m), _lit_vec(codebook[m][k])) for k in range(PQ_K)])

    d = t.select(
        "vec_id", *[dists(m).alias(f"d{m}") for m in range(PQ_M)]
    )
    mins = [F.array_min(F.col(f"d{m}")) for m in range(PQ_M)]
    return d.select(
        "vec_id",
        F.array(
            *[
                (F.array_position(F.col(f"d{m}"), mins[m]) - 1).cast("int")
                for m in range(PQ_M)
            ]
        ).alias("codes"),
        sum(mins[1:], mins[0]).alias("distortion"),
    )


@register(
    "kmeans_assign_iter",
    oracle=f"""
    WITH t AS (
        SELECT vec_id, {_IVEC_SQL} AS iv FROM embeddings
    ), cb AS (
        SELECT CAST(vec_id AS INT) AS k, iv AS cv FROM t WHERE vec_id < {KM_K}
    ), a AS (
        SELECT t.vec_id, t.iv, c.k,
               ROW_NUMBER() OVER (
                   PARTITION BY t.vec_id
                   ORDER BY list_sum(list_transform(range(1, {DIM} + 1),
                       i -> (t.iv[i] - c.cv[i]) * (t.iv[i] - c.cv[i]))), c.k
               ) AS rn
        FROM t CROSS JOIN cb c
    ), asn AS (
        SELECT vec_id, iv, k AS cluster_id FROM a WHERE rn = 1
    )
    SELECT cluster_id,
           CAST(i - 1 AS INT) AS dim,
           COUNT(*) AS n_members,
           SUM(iv[i])::DOUBLE / (COUNT(*) * {SCALE})::DOUBLE AS centroid
    FROM asn, unnest(range(1, {DIM} + 1)) AS u(i)
    GROUP BY cluster_id, i
    """,
    doc=f"one exact Lloyd k-means iteration over the embedding corpus: "
    f"assign every vector to the nearest of {KM_K} seed centroids "
    f"(vectors vec_id < {KM_K}), emit the recomputed per-cluster "
    "per-dimension centroid means",
    survey_ref="training-pipeline ops: the codebook-training / corpus-"
    "clustering step behind ann_ivf_probed's partitions and cluster-"
    "balanced data curation; iterate by feeding centroids back in",
)
def kmeans_assign_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment is narrow (literal centroids, exact-int argmin with
    the same (dist, k) tiebreak as the oracle window); the recompute is
    ONE shuffle carrying K x (DIM+1) map-side-combined partial sums —
    `sum(element_at(iv, i))` per dimension, never an N*DIM explode.
    The per-dim unpack (posexplode) happens on K aggregated rows. Sums
    stay exact: |iv_i| <= ~6e5 here (and < 2^53/N generally), counts
    are exact, and the centroid mean is one double division — the
    emitted doubles match the oracle bit-for-bit."""
    seeds = _collect_seed_ivecs(spark, sf_dir, KM_K)
    t = _t(spark, sf_dir, "embeddings").select("vec_id", int_vec().alias("iv"))
    dists = F.array(*[_l2_int(F.col("iv"), _lit_vec(seeds[k])) for k in range(KM_K)])
    asn = t.select(
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cluster_id"),
        "iv",
    )
    agg = asn.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.array(
            *[F.sum(F.element_at("iv", i + 1)) for i in range(DIM)]
        ).alias("sums"),
    )
    return agg.select(
        "cluster_id",
        "n_members",
        F.posexplode("sums").alias("dim", "s"),
    ).select(
        "cluster_id",
        F.col("dim").cast("int").alias("dim"),
        "n_members",
        (
            F.col("s").cast("double")
            / (F.col("n_members") * SCALE).cast("double")
        ).alias("centroid"),
    )
