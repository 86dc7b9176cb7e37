"""Greedy k-center coreset selection (Gonzalez farthest-point) over
the embedding table.

Coreset selection picks k representatives whose coverage radius
(max distance from any point to its nearest representative) is
near-minimal — the classic 2-approximation is greedy farthest-point:
seed with one point, then repeatedly add the point farthest from the
current set. It is the geometry-based data-selection pass (diversity
sampling / active-learning seeding) that complements the
density-based ones (SemDeDup prunes redundancy, DSIR reweights by
target likelihood; k-center guarantees coverage).

Exactness: vectors are scaled to exact int64 (veclib discipline), so
squared L2 distances are exact BIGINT on both engines. Each greedy
argmax is decomposed into two scalar aggregates — ``max(dist)`` then
``min(vec_id) among the achievers`` — which is deterministic without
any composite ordering key (and immune to the arg_max-on-struct
semantics differing between engines).

K stays a compile-time constant (3): each round is a full-scan
aggregate, so the plan is a K-deep chain of (scan → 1-row broadcast)
stages. For large K on a cluster, localCheckpoint the running
min-distance column per round instead of re-deriving it (same loop
discipline as graph.pagerank_iteration); the per-round cost is one
narrow map + one all-to-one agg either way.

Output: one row per selected center — selection rank, center id, how
many points it serves under nearest-center assignment (ties to the
lower rank), and the exact squared coverage radius of its cell.

Scale notes (100 TB): every round is embarrassingly parallel (narrow
map over the vectors + a map-side-combined scalar agg; the 1-row
center rows broadcast). Nothing ever shuffles the vector table
itself — the only exchanges carry single rows (scalar aggregates)
and the final ≤K-group census.

Reference parity: the reference has no geometric ops (SURVEY §2.5 —
absent); this extends the training-pipeline similarity family
(SURVEY "LLM-data-pipeline operators"; greedy k-center is the public
Gonzalez 1985 algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.veclib import _IVEC_SQL, int_vec
from ethereum_etl_airflow_spark.queries import _t, register

_DIM = 64

#: exact squared L2 between two int64 vectors (Spark side)
def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _sqdist_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, {_DIM + 1}),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
    )


@register(
    "kcenter_coreset_select",
    oracle=f"""
    WITH qe AS (
        SELECT vec_id, {_IVEC_SQL} AS q FROM embeddings
    ),
    c1 AS (SELECT min(vec_id) AS id1 FROM qe),
    q1 AS (SELECT q AS qc1 FROM qe, c1 WHERE vec_id = id1),
    d1 AS (
        SELECT vec_id, q, {_sqdist_sql("q", "qc1")} AS dist1
        FROM qe CROSS JOIN q1
    ),
    m1 AS (SELECT max(dist1) AS mx1 FROM d1),
    c2 AS (SELECT min(vec_id) AS id2 FROM d1, m1 WHERE dist1 = mx1),
    q2 AS (SELECT q AS qc2 FROM qe, c2 WHERE vec_id = id2),
    d2 AS (
        SELECT vec_id, q, dist1,
               least(dist1, {_sqdist_sql("q", "qc2")}) AS dist2,
               {_sqdist_sql("q", "qc2")} AS dc2
        FROM d1 CROSS JOIN q2
    ),
    m2 AS (SELECT max(dist2) AS mx2 FROM d2),
    c3 AS (SELECT min(vec_id) AS id3 FROM d2, m2 WHERE dist2 = mx2),
    q3 AS (SELECT q AS qc3 FROM qe, c3 WHERE vec_id = id3),
    asg AS (
        SELECT vec_id, dist1 AS da, dc2 AS db,
               {_sqdist_sql("q", "qc3")} AS dc
        FROM d2 CROSS JOIN q3
    ),
    pick AS (
        SELECT vec_id,
               CASE WHEN da <= db AND da <= dc THEN 1
                    WHEN db <= dc THEN 2 ELSE 3 END AS sel_rank,
               CASE WHEN da <= db AND da <= dc THEN da
                    WHEN db <= dc THEN db ELSE dc END AS sq_dist
        FROM asg
    )
    SELECT sel_rank,
           CASE sel_rank WHEN 1 THEN (SELECT id1 FROM c1)
                         WHEN 2 THEN (SELECT id2 FROM c2)
                         ELSE (SELECT id3 FROM c3) END AS center_id,
           COUNT(*) AS n_assigned,
           MAX(sq_dist) AS max_sq_dist
    FROM pick
    GROUP BY sel_rank
    """,
    doc="greedy k-center (Gonzalez farthest-point, k=3): exact-int64 "
    "squared L2; each argmax = max(dist) then min(vec_id) among "
    "achievers (deterministic, engine-neutral); output = per-center "
    "selection rank, assigned population (ties to lower rank), and "
    "exact squared coverage radius",
    survey_ref="Gonzalez 1985 k-center (public algorithm); "
    "training-pipeline diversity-selection family alongside "
    "semdedup_cluster_prune / dsir_importance_weights",
)
def kcenter_coreset_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K rounds of (narrow map + scalar agg + 1-row broadcast); the
    vector table itself never shuffles — exchanges carry single rows
    until the final ≤K-group census. The round outputs (qe, d1, d2)
    are each referenced by several later stages, so they are
    localCheckpointed — the table scans ONCE and each round's
    distance column computes once, instead of the naive DAG
    re-expanding every subtree per reference (31 scans observed; on a
    real cluster use a reliable checkpoint dir, same call shape —
    graph.py discipline)."""
    qe = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", int_vec().alias("q"))
        .localCheckpoint()
    )

    def center_vec(df: DataFrame, id_col: str):
        """1-row (id, qvec) for the chosen center — broadcastable."""
        return F.broadcast(
            qe.join(F.broadcast(df), qe.vec_id == df[id_col]).select(
                F.col(id_col), F.col("q").alias(f"q_{id_col}")
            )
        )

    c1 = qe.agg(F.min("vec_id").alias("id1"))
    d1 = (
        qe.crossJoin(center_vec(c1, "id1"))
        .select(
            "vec_id",
            "q",
            "id1",
            _sqdist(F.col("q"), F.col("q_id1")).alias("dist1"),
        )
        .localCheckpoint()
    )
    m1 = d1.agg(F.max("dist1").alias("mx1"))
    c2 = (
        d1.crossJoin(F.broadcast(m1))
        .where(F.col("dist1") == F.col("mx1"))
        .agg(F.min("vec_id").alias("id2"))
    )
    d2 = d1.crossJoin(center_vec(c2, "id2")).select(
        "vec_id",
        "q",
        "id1",
        "id2",
        "dist1",
        _sqdist(F.col("q"), F.col("q_id2")).alias("dc2"),
    )
    d2 = d2.withColumn("dist2", F.least("dist1", "dc2")).localCheckpoint()
    m2 = d2.agg(F.max("dist2").alias("mx2"))
    c3 = (
        d2.crossJoin(F.broadcast(m2))
        .where(F.col("dist2") == F.col("mx2"))
        .agg(F.min("vec_id").alias("id3"))
    )
    asg = d2.crossJoin(center_vec(c3, "id3")).select(
        "vec_id",
        "id1",
        "id2",
        "id3",
        F.col("dist1").alias("da"),
        F.col("dc2").alias("db"),
        _sqdist(F.col("q"), F.col("q_id3")).alias("dc"),
    )
    pick = asg.select(
        "vec_id",
        "id1",
        "id2",
        "id3",
        F.when((F.col("da") <= F.col("db")) & (F.col("da") <= F.col("dc")), 1)
        .when(F.col("db") <= F.col("dc"), 2)
        .otherwise(3)
        .alias("sel_rank"),
        F.when(
            (F.col("da") <= F.col("db")) & (F.col("da") <= F.col("dc")),
            F.col("da"),
        )
        .when(F.col("db") <= F.col("dc"), F.col("db"))
        .otherwise(F.col("dc"))
        .alias("sq_dist"),
    )
    return pick.groupBy("sel_rank").agg(
        F.max(
            F.when(F.col("sel_rank") == 1, F.col("id1"))
            .when(F.col("sel_rank") == 2, F.col("id2"))
            .otherwise(F.col("id3"))
        ).alias("center_id"),
        F.count("*").alias("n_assigned"),
        F.max("sq_dist").alias("max_sq_dist"),
    )
