"""PCA power-iteration step over the embedding corpus, exact integers.

Dimensionality reduction is the third leg of the embedding-compression
family (int8 scalar quantize + PQ codebooks in ``quantize.py``): the
top principal directions tell a curation pipeline which axes of the
embedding space carry variance (whitening before LSH/PQ measurably
improves recall — public result, Jégou et al. TPAMI 2011 §V; power
iteration itself is the classic Mises iteration, public literature).

One distributed power-iteration STEP is the whole algorithm's
building block: ``y = A^T (A v)`` where A is the N x D embedding
matrix — i.e. per row, the scalar projection ``p_i = <x_i, v>``, then
the D-vector sum ``y = Σ_i p_i * x_i``.  Iterating (renormalizing
between steps, driver-side on a D-length vector) converges to the top
eigenvector of the Gram matrix A^T A.  The step here uses the
deterministic all-ones start vector, so ``p_i`` is just the element
sum — and every product stays in the exact-int64 veclib discipline so
the DuckDB oracle reproduces it bit-for-bit.

Spark-first plan (ONE corpus scan, ONE bounded shuffle):

* ``iv = int_vec(embedding)`` — narrow;
* ``p = list_sum(iv)`` — narrow (``F.aggregate`` fold, JVM codegen);
* ``posexplode(iv)`` → (dim, iv_j * p) — narrow flat map (N*D rows
  but never materialized: partial aggregation combines map-side, so
  the shuffle carries at most D rows *per task*);
* groupBy(dim) decimal-sum — D=64 reduce keys.

Scale note (10^9 x 64): the explode feeds straight into a hash
aggregate with map-side combine — each of the ~10^4 tasks emits 64
partial rows, so the exchange moves ~6e5 rows for a 6.4e10-element
matmul.  The per-element product ``iv_j * p_i`` is ≤ 1e6 * 6.4e7 <
2^63 (int64-safe); the cross-row SUM is where overflow lives, so it
accumulates as DECIMAL(38,0) on both engines and ships as DOUBLE.

Reference parity: no vector stage in the reference (it stops at
decoded event tables, build_parse_dag.py); this is engine-side
infrastructure for the dedup/ANN surfaces (SURVEY §2 similarity
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.veclib import _IVEC_SQL, int_vec
from ethereum_etl_airflow_spark.queries import _t, register


@register(
    "embedding_pca_power_iter",
    oracle=f"""
    WITH q AS (
        SELECT {_IVEC_SQL} AS iv
        FROM embeddings
    ), p AS (
        SELECT iv, list_sum(iv)::BIGINT AS proj FROM q
    ), contrib AS (
        SELECT u.i AS dim, iv[u.i + 1] * proj AS c
        FROM p, unnest(range(0, len(iv))) AS u(i)
    )
    SELECT dim::BIGINT AS dim,
           CAST(SUM(CAST(c AS DECIMAL(38,0))) AS DOUBLE) AS component
    FROM contrib GROUP BY dim
    """,
    doc="one exact power-iteration step y = A^T(A v0) with v0 = ones: "
    "per-row int projection (narrow fold), posexplode into a map-side-"
    "combined 64-key aggregate — the shuffle carries D rows per task, "
    "not N*D; per-element products int64-exact, cross-row sums "
    "decimal(38,0), emitted as double",
    survey_ref="embedding-compression family third leg (whitening / "
    "top-eigenvector direction; Mises power iteration, Jégou TPAMI'11 "
    "§V); siblings embedding_quantize_int8 / ann_pq_encode "
    "(functions/quantize.py)",
)
def embedding_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: scan → int_vec + element-sum fold (one codegen stage) →
    posexplode → partial-agg → 64-key exchange → final agg. Nothing
    driver-side; iterating = re-running with v passed as literals
    (bounded D-length vector, the quantize.py codebook discipline)."""
    emb = _t(spark, sf_dir, "embeddings")
    iv = int_vec()
    rows = emb.select(
        iv.alias("iv"),
        F.aggregate(iv, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "proj"
        ),
    )
    return (
        rows.select(
            F.posexplode("iv").alias("dim", "iv_j"),
            F.col("proj"),
        )
        .groupBy(F.col("dim").cast("long").alias("dim"))
        .agg(
            F.sum((F.col("iv_j") * F.col("proj")).cast("decimal(38,0)"))
            .cast("double")
            .alias("component")
        )
    )
