"""IVF-Flat approximate nearest neighbor: coarse k-means quantizer +
probed exact search — the third point on the ANN cost curve after
brute force (``ann_topk_cosine``) and hyperplane LSH
(``ann_lsh_bucketed``).

Pipeline (classic IVF, deterministic end to end):

1. seeds — the ``K_IVF`` lowest ``vec_id`` vectors (data-deterministic,
   no RNG);
2. one Lloyd step — every vector joins its max-cosine seed, then each
   cluster's EXACT integer component sums become the new centroid
   direction. Cosine-to-mean equals cosine-to-sum (the 1/n scale
   cancels), so the centroid is represented by the sum vector and no
   division ever happens in integer space;
3. final assignment against the summed centroids — this is the
   inverted file: at 10^9 vectors the cluster id is the table's
   partition key, so a probe reads only its clusters' partitions;
4. queries probe their ``P_PROBE`` best clusters and rank candidates
   exactly (same int-dot + IEEE double cosine as the brute-force
   baseline).

Cross-engine determinism: dots/norms against centroids are computed in
128-bit-exact space (Spark ``decimal(38,0)`` / DuckDB ``HUGEINT``) —
component sums over 10^8-member clusters overflow int64 — and only
then cast to double; every double op used (cast, divide, sqrt,
compare) is exactly rounded under IEEE-754, so Spark and DuckDB order
candidates identically. Ties break on centroid / neighbor id.

Spark-first shape: assignment is a MAP-SIDE argmax over compile-time
literal centroid arrays (no join, no shuffle, whole-stage codegen) —
the two tiny centroid collects (K rows, then K x DIM sums) are the
same bounded two-phase-scan discipline as ``corpus.global_prefix_sum``.
The oracle derives the identical pipeline purely in SQL.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.veclib import (
    DIM,
    N_QUERIES,
    TOP_K,
    _dot,
    _dot_sql,
    _IVEC_SQL,
    _norm_sq,
    _NORM_SQL,
    int_vec,
)
from ethereum_etl_airflow_spark.queries import _t, register

K_IVF = 8
P_PROBE = 2


def _dot_dec(a, b):
    """Exact decimal(38,0) dot product (centroid components can exceed
    the int64 product range at scale)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("decimal(38,0)") * y),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: acc + x,
    )


def _dotc_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {DIM}), "
        f"i -> {a}[i]::HUGEINT * {b}[i]))"
    )


def _cent_score_sql(iv: str, cv: str) -> str:
    """cosine(v, centroid) up to the constant 1/|v| factor — enough for
    per-vector ranking; HUGEINT-exact until the final double ops."""
    return (
        f"({_dotc_sql(iv, cv)}::DOUBLE / "
        f"sqrt({_dotc_sql(cv, cv)}::DOUBLE))"
    )


def _argmax_cluster(iv, cents: list[tuple[int, list[int]]]):
    """Map-side argmax over literal centroids: array_max of
    (score, -cid) structs — max score, then SMALLEST cid on ties,
    mirroring the oracle's (score DESC, cid ASC) window."""
    structs = []
    for cid, vec in cents:
        arr = F.array(*[F.lit(int(x)).cast("long") for x in vec])
        nsq = sum(int(x) * int(x) for x in vec)
        score = _dot_dec(iv, arr).cast("double") / F.lit(math.sqrt(float(nsq)))
        structs.append(
            F.struct(score.alias("s"), F.lit(-cid).alias("nc"))
        )
    best = F.array_max(F.array(*structs))
    return (-best["nc"]).cast("int")


def _cent_scores(iv, cents: list[tuple[int, list[int]]]):
    """Array of (score, cid) structs for probe ranking."""
    structs = []
    for cid, vec in cents:
        arr = F.array(*[F.lit(int(x)).cast("long") for x in vec])
        nsq = sum(int(x) * int(x) for x in vec)
        score = _dot_dec(iv, arr).cast("double") / F.lit(math.sqrt(float(nsq)))
        structs.append(F.struct(score.alias("s"), F.lit(cid).alias("cid")))
    return F.array(*structs)


def assign_ivf(
    spark: SparkSession, vecs: DataFrame, id_col: str = "vec_id"
) -> tuple[DataFrame, list]:
    """(id, iv, nsq, cluster) after seeds -> one Lloyd step; also
    returns the summed centroids [(cid, [int components])]. Seeds are
    the ``K_IVF`` lowest ids (any orderable id type)."""
    n = vecs.select(
        id_col, "iv", _norm_sq(F.col("iv")).alias("nsq")
    )
    seed_rows = n.orderBy(id_col).limit(K_IVF).collect()
    if not seed_rows:
        raise ValueError("cannot train an IVF quantizer on an empty input")
    seeds = [(i, list(r["iv"])) for i, r in enumerate(seed_rows)]
    a1 = n.withColumn("cluster", _argmax_cluster(F.col("iv"), seeds))
    # exact integer component sums per cluster (decimal-safe at scale)
    sums = (
        a1.select("cluster", F.posexplode("iv").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(F.sum(F.col("x").cast("decimal(38,0)")).alias("s"))
        .collect()
    )
    by_c: dict[int, dict[int, int]] = {}
    for r in sums:
        by_c.setdefault(r["cluster"], {})[r["pos"]] = int(r["s"])
    cents = [
        (cid, [by_c[cid][p] for p in range(DIM)]) for cid in sorted(by_c)
    ]
    a2 = n.withColumn("cluster", _argmax_cluster(F.col("iv"), cents))
    return a2, cents


@register(
    "ann_ivf_probed",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, {_IVEC_SQL} AS iv FROM embeddings
    ), n AS (
        SELECT vec_id, iv, {_NORM_SQL} AS nsq FROM e
    ), seeds AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS cid, iv AS cv
        FROM (SELECT vec_id, iv FROM e ORDER BY vec_id ASC LIMIT {K_IVF})
    ), s1 AS (
        SELECT n.vec_id, n.iv, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY n.vec_id
                   ORDER BY {_cent_score_sql('n.iv', 'c.cv')} DESC, c.cid ASC
               ) AS rn
        FROM n CROSS JOIN seeds c
    ), a1 AS (
        SELECT vec_id, iv, cid FROM s1 WHERE rn = 1
    ), sums AS (
        SELECT cid, i, SUM(iv[i]) AS s
        FROM a1 CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS i)
        GROUP BY cid, i
    ), cent AS (
        SELECT cid, list(s::BIGINT ORDER BY i) AS cv FROM sums GROUP BY cid
    ), s2 AS (
        SELECT n.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY n.vec_id
                   ORDER BY {_cent_score_sql('n.iv', 'c.cv')} DESC, c.cid ASC
               ) AS rn
        FROM n CROSS JOIN cent c
    ), a2 AS (
        SELECT vec_id, cid FROM s2 WHERE rn = 1
    ), probes AS (
        SELECT vec_id AS query_id, cid
        FROM s2 WHERE vec_id < {N_QUERIES} AND rn <= {P_PROBE}
    ), cand AS (
        SELECT p.query_id, b.vec_id AS neighbor_id
        FROM probes p JOIN a2 b ON b.cid = p.cid
        WHERE b.vec_id <> p.query_id
    ), scored AS (
        SELECT c.query_id, c.neighbor_id,
               {_dot_sql('q.iv', 'b.iv')} AS dot_scaled,
               q.nsq AS norm_q, b.nsq AS norm_b
        FROM cand c
        JOIN n q ON q.vec_id = c.query_id
        JOIN n b ON b.vec_id = c.neighbor_id
    ), ranked AS (
        SELECT query_id, neighbor_id, dot_scaled,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY (dot_scaled::DOUBLE /
                             sqrt(norm_q::DOUBLE * norm_b::DOUBLE)) DESC,
                            neighbor_id ASC
               ) AS rank
        FROM ranked_src_placeholder
    )
    SELECT query_id, neighbor_id, rank, dot_scaled
    FROM ranked WHERE rank <= {TOP_K}
    """.replace("ranked_src_placeholder", "scored"),
    doc=f"IVF-Flat ANN: {K_IVF} deterministic-seed centroids, one exact-"
    f"int Lloyd step, {P_PROBE}-cluster probe, exact in-cluster ranking",
    survey_ref="training-pipeline ops (ANN scale path #2: inverted-file "
    "partition pruning; cluster id = partition key at 10^9 vectors)",
)
def ann_ivf_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select("vec_id", int_vec().alias("iv"))
    assigned, cents = assign_ivf(spark, e)
    q = (
        assigned.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("iv").alias("qiv"),
            F.col("nsq").alias("norm_q"),
            F.explode(_cent_scores(F.col("iv"), cents)).alias("sc"),
        )
        .select("query_id", "qiv", "norm_q", "sc.s", "sc.cid")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("s"), F.asc("cid")
    )
    probes = (
        q.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= P_PROBE)
        .select("query_id", "qiv", "norm_q", "cid")
    )
    cand = F.broadcast(probes).join(
        assigned.alias("b"), F.col("b.cluster") == F.col("cid")
    ).where(F.col("b.vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col("b.vec_id").alias("neighbor_id"),
        _dot(F.col("qiv"), F.col("b.iv")).alias("dot_scaled"),
        "norm_q",
        F.col("b.nsq").alias("norm_b"),
    )
    cos = F.col("dot_scaled").cast("double") / F.sqrt(
        F.col("norm_q").cast("double") * F.col("norm_b").cast("double")
    )
    w = Window.partitionBy("query_id").orderBy(cos.desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "dot_scaled")
    )
