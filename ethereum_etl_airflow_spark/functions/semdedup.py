"""SemDeDup: semantic near-duplicate pruning via embedding clusters.

The public method (Abbas et al., "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", 2023 — arXiv:2303.09540)
for curating web-scale training corpora: cluster the embedding space
with k-means, then look for near-duplicates ONLY within a cluster
(cosine above a threshold), keeping one representative per duplicate
group.  The clustering is what makes the quadratic pairwise step
tractable — candidate pairs drop from N² to Σ|cluster|².

Composition over this engine's existing kernels:

* **assign** — exact-int nearest-centroid over the KM_K literal seed
  centroids (the ``kmeans_assign_iter`` discipline from
  ``quantize.py``: the codebook is bounded, rides the plan as
  literals, assignment is a ZERO-shuffle scan-project);
* **pairwise within cluster** — a self-join on cluster_id; the
  cosine test is the exact integer inequality
  ``10^4·dot² ≥ τ²·‖a‖²·‖b‖²`` with dot > 0 (the ``similarity.py``
  boundary rule, τ = 0.45) evaluated in DECIMAL(38,0) so no float
  ever decides a pair (DuckDB twin uses HUGEINT);
* **keep rule** — a vector is pruned iff a LOWER-id near-duplicate
  shares its cluster (deterministic representative = min vec_id,
  the ``dedup_cluster_canonical`` convention; the paper keeps the
  centroid-farthest — any single-representative rule is admissible
  and min-id is replay-stable).

Scale notes (10^9 vectors): the self-join shuffles each cluster once
on cluster_id; with production K ∝ N/⟨cluster⟩ the per-reducer work
is ⟨cluster⟩² bounded.  Hot clusters subdivide recursively (re-run
assign inside the cluster — same plan); the in-cluster kernel can
also swap to the blocked ``applyInPandas`` matmul of
``dedup_embedding_cosine`` unchanged since both sides agree on the
integer pair semantics.  K is literal 8 here to match the seeded
test codebook.

Reference parity: no vector stage in the reference; this is the
curation step between dedup (SURVEY §2 similarity family) and the
CDC-ingested training table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.veclib import (
    COS_THRESHOLD_SQ_X10000,
    DIM,
    _IVEC_SQL,
    _NORM_SQL,
    _dot,
    _dot_sql,
    _norm_sq,
    int_vec,
)
from ethereum_etl_airflow_spark.queries import _t, register

#: cluster count — matches the seeded kmeans_assign_iter codebook
SD_K = 8


@register(
    "semdedup_cluster_prune",
    oracle=f"""
    WITH t AS (
        SELECT vec_id, {_IVEC_SQL} AS iv FROM embeddings
    ), cb AS (
        SELECT CAST(vec_id AS INT) AS k, iv AS cv FROM t WHERE vec_id < {SD_K}
    ), a AS (
        SELECT t.vec_id, t.iv, c.k,
               ROW_NUMBER() OVER (
                   PARTITION BY t.vec_id
                   ORDER BY list_sum(list_transform(range(1, {DIM} + 1),
                       i -> (t.iv[i] - c.cv[i]) * (t.iv[i] - c.cv[i]))), c.k
               ) AS rn
        FROM t CROSS JOIN cb c
    ), asn AS (
        SELECT vec_id, iv, k AS cluster_id, {_NORM_SQL} AS nn
        FROM a WHERE rn = 1
    ), pairs AS (
        SELECT b.vec_id AS v,
               {_dot_sql('a.iv', 'b.iv')} AS dot,
               a.nn AS na, b.nn AS nb
        FROM asn a JOIN asn b
          ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
    ), pruned AS (
        SELECT DISTINCT v AS vec_id FROM pairs
        WHERE dot > 0
          AND dot::HUGEINT * dot * 10000
              >= {COS_THRESHOLD_SQ_X10000}::HUGEINT * na * nb
    )
    SELECT asn.vec_id, asn.cluster_id,
           (p.vec_id IS NULL) AS kept
    FROM asn LEFT JOIN pruned p ON asn.vec_id = p.vec_id
    """,
    doc="SemDeDup semantic pruning: exact-int nearest-centroid cluster "
    "assignment (zero-shuffle, literal codebook), within-cluster "
    "pairwise cosine >= 0.45 as the exact decimal/hugeint inequality, "
    "prune everything with a lower-id near-duplicate in its cluster — "
    "the admission filter run before a corpus enters the CDC training "
    "table (Abbas et al. 2023, arXiv:2303.09540)",
    survey_ref="curation composition of kmeans_assign_iter (assignment) "
    "+ dedup_embedding_cosine (pair semantics) + "
    "dedup_cluster_canonical (min-id representative)",
)
def semdedup_cluster_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: one scan computes (iv, norm, cluster) — assignment is an
    argmin over SD_K literal-centroid exact distances, all codegen;
    localCheckpoint pins the assigned table (three downstream
    references — both self-join sides and the verdict join) so the
    corpus scans ONCE; the self-join shuffles on cluster_id only."""
    from ethereum_etl_airflow_spark.functions.quantize import (
        _collect_seed_ivecs,
        _l2_int,
        _lit_vec,
    )

    seeds = _collect_seed_ivecs(spark, sf_dir, SD_K)
    iv = int_vec()
    dists = F.array(*[_l2_int(iv, _lit_vec(s)) for s in seeds])
    asn = (
        _t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            iv.alias("iv"),
            _norm_sq(iv).alias("nn"),
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cluster_id"),
        )
        .localCheckpoint()
    )
    a, b = asn.alias("a"), asn.alias("b")
    dot = _dot(F.col("a.iv"), F.col("b.iv"))
    pairs = a.join(
        b,
        (F.col("a.cluster_id") == F.col("b.cluster_id"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("b.vec_id").alias("v"),
        dot.alias("dot"),
        F.col("a.nn").alias("na"),
        F.col("b.nn").alias("nb"),
    )
    dd = F.col("dot").cast("decimal(38,0)")
    pruned = (
        pairs.where(
            (F.col("dot") > 0)
            & (
                dd * dd * F.lit(10000)
                >= F.lit(COS_THRESHOLD_SQ_X10000)
                * F.col("na").cast("decimal(38,0)")
                * F.col("nb").cast("decimal(38,0)")
            )
        )
        .select("v")
        .distinct()
    )
    return asn.join(
        pruned, asn["vec_id"] == pruned["v"], "left"
    ).select(
        "vec_id",
        "cluster_id",
        F.col("v").isNull().alias("kept"),
    )
