"""Similarity search over embedding columns: cosine near-dup pairs,
brute-force top-k ANN (the baseline), and LSH-bucketed ANN (the scale
path).

Numeric discipline: float32 embeddings are scaled to exact integers
(``floor(x * 1e6)``) before any arithmetic. Dot products and norms are
then 64-bit-integer exact and bit-identical between Spark and the
DuckDB oracle; threshold checks run in 128-bit-exact space
(Spark decimal(38,0) / DuckDB HUGEINT) so no float comparison can
drift. Ranking uses doubles only through IEEE-identical expressions
(same operand order in both engines).

Scale notes (100 TB / 10^9 vectors):
* brute-force is O(Q * N) — fine for small query sets, the oracle
  baseline otherwise;
* cosine near-dup all-pairs is the LSH story: random-hyperplane
  buckets cut candidates to same-bucket pairs (``ann_lsh_bucketed``
  demonstrates the bucketing; the same bucket column partitions an
  Iceberg table for at-scale runs);
* hyperplanes are deterministic compile-time literals (derived from
  md5 — functions/hashing.py discipline), broadcast with the plan,
  zero runtime hashing.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register

DIM = 64
SCALE = 1_000_000
COS_THRESHOLD_SQ_X10000 = 2025  # tau = 0.45 -> tau^2 * 10^4
N_PLANES = 8
TOP_K = 5
N_QUERIES = 10


def _plane_sign(p: int, i: int) -> int:
    """Deterministic pseudo-random hyperplane component in {-1, +1}
    (same md5-derived discipline as functions/hashing.phash60)."""
    h = hashlib.md5(f"pl{p}-{i}".encode()).hexdigest()
    return 1 if int(h[:15], 16) % 2 == 1 else -1


PLANES = [[_plane_sign(p, i) for i in range(DIM)] for p in range(N_PLANES)]


def int_vec(emb=None):
    """float32 array -> exact scaled int64 array."""
    emb = F.col("embedding") if emb is None else emb
    return F.transform(emb, lambda x: F.floor(x.cast("double") * SCALE).cast("long"))


def _norm_sq(iv):
    return F.aggregate(iv, F.lit(0).cast("long"), lambda acc, x: acc + x * x)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


_IVEC_SQL = f"list_transform(embedding, x -> floor(x::DOUBLE * {SCALE})::BIGINT)"
_NORM_SQL = "list_sum(list_transform(iv, x -> x * x))::BIGINT"


def _dot_sql(a: str, b: str) -> str:
    return f"list_sum(list_transform(generate_series(1, {DIM}), i -> {a}[i] * {b}[i]))::BIGINT"


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, {_IVEC_SQL} AS iv FROM embeddings
    ), n AS (
        SELECT vec_id, label, iv, {_NORM_SQL} AS nsq FROM e
    ), p AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_dot_sql('a.iv', 'b.iv')} AS dot_scaled,
               a.nsq AS norm_a, b.nsq AS norm_b
        FROM n a JOIN n b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, dot_scaled, norm_a, norm_b
    FROM p
    WHERE dot_scaled > 0
      AND dot_scaled::HUGEINT * dot_scaled * 10000
          >= {COS_THRESHOLD_SQ_X10000}::HUGEINT * norm_a * norm_b
    """,
    doc="embedding cosine near-dup pairs (exact scaled-int arithmetic)",
    survey_ref="training-pipeline ops (embedding-cosine near-dup)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine >= 0.45 near-dup detection as a broadcast block
    matmul: the (small) scaled-int matrix ships to every task inside
    the mapInPandas closure; each Arrow batch of rows multiplies
    against the whole matrix with one int64 ``numpy.matmul`` (exact —
    values bounded well under 2^63). That replaces a 12.5M-row
    self-join + interpreted higher-order-function dot products with a
    single narrow pass (~10x faster at sf0.1).

    The threshold test stays EXACT: a float64 prefilter with a 1e-9
    relative margin, then the survivors re-checked in arbitrary-
    precision Python ints (10^4 dot^2 >= 2025 |a|^2 |b|^2) — no float
    comparison decides a boundary case.

    Scale path: at 10^9 vectors the broadcast side becomes the LSH
    bucket's members (ann_lsh_bucketed) — same kernel per bucket."""
    import numpy as np

    e = _t(spark, sf_dir, "embeddings").select("vec_id", int_vec().alias("iv"))
    rows = e.collect()  # small dim table; at scale: per-LSH-bucket collect_list
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.iv for r in rows], dtype=np.int64)
    norms = (mat * mat).sum(axis=1)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)
    tau_sq = COS_THRESHOLD_SQ_X10000

    out_schema = (
        "vec_a long, vec_b long, dot_scaled long, norm_a long, norm_b long"
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            q_mat = np.array(list(pdf["iv"]), dtype=np.int64)
            if len(q_mat) == 0:
                continue
            dots = q_mat @ all_mat.T  # exact int64
            q_norms = (q_mat * q_mat).sum(axis=1)
            # float prefilter with margin, then exact recheck
            lhs = (dots.astype(np.float64) ** 2) * 10000.0
            rhs = tau_sq * q_norms[:, None].astype(np.float64) * all_norms[None, :]
            cand = (dots > 0) & (q_ids[:, None] < all_ids[None, :]) & (
                lhs >= rhs * (1.0 - 1e-9)
            )
            qi, bi = np.nonzero(cand)
            keep = [
                (int(q_ids[i]), int(all_ids[j]), int(dots[i, j]), int(q_norms[i]), int(all_norms[j]))
                for i, j in zip(qi, bi)
                if 10000 * int(dots[i, j]) ** 2
                >= tau_sq * int(q_norms[i]) * int(all_norms[j])
            ]
            yield pd.DataFrame(
                keep, columns=["vec_a", "vec_b", "dot_scaled", "norm_a", "norm_b"]
            )

    return e.mapInPandas(run, out_schema)


_COS_SQL = "(dot_scaled::DOUBLE / sqrt(norm_q::DOUBLE * norm_b::DOUBLE))"


@register(
    "ann_topk_cosine",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, {_IVEC_SQL} AS iv FROM embeddings
    ), n AS (
        SELECT vec_id, iv, {_NORM_SQL} AS nsq FROM e
    ), scored AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_dot_sql('q.iv', 'b.iv')} AS dot_scaled,
               q.nsq AS norm_q, b.nsq AS norm_b
        FROM n q JOIN n b ON b.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ), ranked AS (
        SELECT query_id, neighbor_id, dot_scaled,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY {_COS_SQL} DESC, neighbor_id ASC
               ) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, rank, dot_scaled
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="brute-force cosine top-k ANN baseline (exact-int dot products)",
    survey_ref="training-pipeline ops (ANN baseline)",
)
def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors for each of the first 10 vectors.
    Query side is tiny -> broadcast; per-query ranking is a window over
    the scored candidates (TakeOrderedAndProject-per-group shape)."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", int_vec().alias("iv"))
    n = e.select("vec_id", "iv", _norm_sq(F.col("iv")).alias("nsq"))
    q = n.where(F.col("vec_id") < N_QUERIES).alias("q")
    b = n.alias("b")
    scored = (
        F.broadcast(q)
        .join(b, F.col("b.vec_id") != F.col("q.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            _dot(F.col("q.iv"), F.col("b.iv")).alias("dot_scaled"),
            F.col("q.nsq").alias("norm_q"),
            F.col("b.nsq").alias("norm_b"),
        )
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


def _planes_sql() -> str:
    rows = ", ".join("[" + ", ".join(str(s) for s in plane) + "]" for plane in PLANES)
    return f"[{rows}]"


def _bucket_sql(iv: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {N_PLANES}), p -> "
        f"CASE WHEN list_sum(list_transform(generate_series(1, {DIM}), i -> "
        f"{iv}[i] * (({_planes_sql()})[p])[i]))::BIGINT > 0 "
        f"THEN 1 << (p - 1) ELSE 0 END))::INTEGER"
    )


def lsh_bucket(iv) -> F.Column:
    """Random-hyperplane LSH bucket id (Spark side): sign bit per
    plane, packed to an int. Planes are compile-time literal arrays —
    broadcast with the plan, evaluated in codegen."""
    bucket = F.lit(0)
    for p, plane in enumerate(PLANES):
        arr = F.array(*[F.lit(s) for s in plane])
        proj = F.aggregate(
            F.zip_with(iv, arr, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return bucket.cast("int")


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, {_IVEC_SQL} AS iv FROM embeddings
    ), n AS (
        SELECT vec_id, iv, {_NORM_SQL} AS nsq, {_bucket_sql('iv')} AS bucket FROM e
    ), scored AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, q.bucket,
               {_dot_sql('q.iv', 'b.iv')} AS dot_scaled,
               q.nsq AS norm_q, b.nsq AS norm_b
        FROM n q JOIN n b ON b.bucket = q.bucket AND b.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ), ranked AS (
        SELECT query_id, bucket, neighbor_id, dot_scaled,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY {_COS_SQL} DESC, neighbor_id ASC
               ) AS rank
        FROM scored
    )
    SELECT query_id, bucket, neighbor_id, rank, dot_scaled
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="LSH-bucketed ANN: hyperplane buckets prune the candidate set",
    survey_ref="training-pipeline ops (ANN scale path); SURVEY §4 skew/bucketing",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path: candidates are restricted to the query's LSH
    bucket (expected N/2^planes of the corpus), then ranked exactly.
    The bucket column is also the Iceberg partition key at 10^9-vector
    scale — the candidate join becomes partition-pruned."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", int_vec().alias("iv"))
    n = e.select(
        "vec_id", "iv", _norm_sq(F.col("iv")).alias("nsq"), lsh_bucket(F.col("iv")).alias("bucket")
    )
    q = n.where(F.col("vec_id") < N_QUERIES).alias("q")
    b = n.alias("b")
    scored = (
        F.broadcast(q)
        .join(b, (F.col("b.bucket") == F.col("q.bucket")) & (F.col("b.vec_id") != F.col("q.vec_id")))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("q.bucket").alias("bucket"),
            F.col("b.vec_id").alias("neighbor_id"),
            _dot(F.col("q.iv"), F.col("b.iv")).alias("dot_scaled"),
            F.col("q.nsq").alias("norm_q"),
            F.col("b.nsq").alias("norm_b"),
        )
    )
    cos = F.col("dot_scaled").cast("double") / F.sqrt(
        F.col("norm_q").cast("double") * F.col("norm_b").cast("double")
    )
    w = Window.partitionBy("query_id").orderBy(cos.desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "bucket", "neighbor_id", "rank", "dot_scaled")
    )
