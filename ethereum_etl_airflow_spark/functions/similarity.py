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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.veclib import (  # noqa: F401
    COS_THRESHOLD_SQ_X10000,
    DIM,
    N_PLANES,
    N_QUERIES,
    PLANES,
    SCALE,
    TOP_K,
    _dot,
    _dot_sql,
    _IVEC_SQL,
    _NORM_SQL,
    _norm_sq,
    _planes_sql,
    int_vec,
)
from ethereum_etl_airflow_spark.queries import _t, register


#: exact all-pairs block decomposition: each unordered block pair is one
#: cogroup task. At 10^9 vectors set ~N/50k so a block's matrix fits an
#: executor; here 8 keeps every core busy at test scale.
N_BLOCKS = 8

_PAIR_SCHEMA = "vec_a long, vec_b long, dot_scaled long, norm_a long, norm_b long"


def _pair_kernel_rows(a_ids, a_mat, b_ids, b_mat, require_lt: bool):
    """Exact-int cosine pair kernel shared by the block-matmul and the
    LSH-banded variants: one int64 ``numpy.matmul`` per task (exact —
    values bounded well under 2^63), float64 prefilter with a 1e-9
    margin, survivors re-checked in arbitrary-precision Python ints
    (10^4 dot^2 >= tau_sq |a|^2 |b|^2) so no float comparison decides a
    boundary case."""
    import numpy as np

    tau_sq = COS_THRESHOLD_SQ_X10000
    a_norms = (a_mat * a_mat).sum(axis=1)
    b_norms = (b_mat * b_mat).sum(axis=1)
    dots = a_mat @ b_mat.T
    lhs = (dots.astype(np.float64) ** 2) * 10000.0
    rhs = tau_sq * a_norms[:, None].astype(np.float64) * b_norms[None, :].astype(np.float64)
    cand = (dots > 0) & (lhs >= rhs * (1.0 - 1e-9))
    if require_lt:
        cand &= a_ids[:, None] < b_ids[None, :]
    else:
        cand &= a_ids[:, None] != b_ids[None, :]
    out = []
    for i, j in zip(*np.nonzero(cand)):
        d, na, nb = int(dots[i, j]), int(a_norms[i]), int(b_norms[j])
        if 10000 * d * d < tau_sq * na * nb:
            continue  # float prefilter overshoot — exact check rejects
        u, v = int(a_ids[i]), int(b_ids[j])
        if u < v:
            out.append((u, v, d, na, nb))
        else:
            out.append((v, u, d, nb, na))
    return out


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
    doc="embedding cosine near-dup pairs (exact scaled-int arithmetic, "
    "distributed block matmul — no driver collect)",
    survey_ref="training-pipeline ops (embedding-cosine near-dup)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs cosine >= 0.45 near-dup detection, fully
    distributed: vectors hash into B blocks, every unordered block pair
    (bi <= bj) is one cogrouped ``applyInPandas`` task running the
    exact int64 matmul kernel. No ``collect()``, no broadcast of the
    table — shuffle volume is B copies of each vector, compute is the
    inherent O(N^2/2) spread over B(B+1)/2 independent tasks.

    Each unordered pair {{u,v}} lands in exactly one task (the sorted
    pair of the two blocks), so no post-dedup pass is needed; diagonal
    tasks enforce vec_a < vec_b in-kernel.

    Scale path: the same kernel runs per LSH band in
    ``dedup_embedding_cosine_lsh`` — candidate semantics instead of
    all-pairs when N^2 itself is the bottleneck."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        int_vec().alias("iv"),
        F.pmod(F.col("vec_id"), F.lit(N_BLOCKS)).cast("int").alias("blk"),
    )
    combos = [
        (bi * N_BLOCKS + bj, bi, bj)
        for bi in range(N_BLOCKS)
        for bj in range(bi, N_BLOCKS)
    ]
    combos_df = spark.createDataFrame(combos, "gid int, bi int, bj int")
    left = (
        e.alias("l")
        .join(combos_df.alias("cl"), F.col("l.blk") == F.col("cl.bi"))
        .select(
            F.col("cl.gid").alias("gid"), F.col("cl.bi").alias("bi"),
            F.col("cl.bj").alias("bj"), F.col("l.vec_id").alias("vec_id"),
            F.col("l.iv").alias("iv"),
        )
    )
    right = (
        e.alias("r")
        .join(combos_df.alias("cr"), F.col("r.blk") == F.col("cr.bj"))
        .select(
            F.col("cr.gid").alias("gid"), F.col("r.vec_id").alias("vec_id"),
            F.col("r.iv").alias("iv"),
        )
    )

    def run(key, lpdf, rpdf):
        import numpy as np
        import pandas as pd

        cols = ["vec_a", "vec_b", "dot_scaled", "norm_a", "norm_b"]
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame(columns=cols)
        diagonal = bool(lpdf["bi"].iloc[0] == lpdf["bj"].iloc[0])
        a_ids = lpdf["vec_id"].to_numpy(dtype=np.int64)
        a_mat = np.array(list(lpdf["iv"]), dtype=np.int64)
        b_ids = rpdf["vec_id"].to_numpy(dtype=np.int64)
        b_mat = np.array(list(rpdf["iv"]), dtype=np.int64)
        rows = _pair_kernel_rows(a_ids, a_mat, b_ids, b_mat, require_lt=diagonal)
        return pd.DataFrame(rows, columns=cols)

    return (
        left.groupBy("gid")
        .cogroup(right.groupBy("gid"))
        .applyInPandas(run, _PAIR_SCHEMA)
    )


#: banded hyperplane LSH for the candidate-generation variant: the 8
#: planes split into 4 bands of 2 — a pair is a candidate iff it agrees
#: on BOTH planes of at least one band (OR-amplification across bands)
BAND_PLANES = 2
N_BANDS = N_PLANES // BAND_PLANES


def _band_key_sql(iv: str, b: int) -> str:
    terms = []
    for q in range(BAND_PLANES):
        p = b * BAND_PLANES + q + 1  # 1-indexed plane
        proj = (
            f"list_sum(list_transform(generate_series(1, {DIM}), i -> "
            f"{iv}[i] * (({_planes_sql()})[{p}])[i]))::BIGINT"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << q} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def band_keys(iv) -> F.Column:
    """Array of per-band LSH keys (sign bits of the band's planes)."""
    keys = []
    for b in range(N_BANDS):
        key = F.lit(0)
        for q in range(BAND_PLANES):
            plane = PLANES[b * BAND_PLANES + q]
            arr = F.array(*[F.lit(s) for s in plane])
            proj = F.aggregate(
                F.zip_with(iv, arr, lambda x, s: x * s),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            key = key + F.when(proj > 0, F.lit(1 << q)).otherwise(0)
        keys.append(key.cast("int"))
    return F.array(*keys)


@register(
    "dedup_embedding_cosine_lsh",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, {_IVEC_SQL} AS iv FROM embeddings
    ), n AS (
        SELECT vec_id, iv, {_NORM_SQL} AS nsq,
               {_band_key_sql('iv', 0)} AS k0, {_band_key_sql('iv', 1)} AS k1,
               {_band_key_sql('iv', 2)} AS k2, {_band_key_sql('iv', 3)} AS k3
        FROM e
    ), p AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_dot_sql('a.iv', 'b.iv')} AS dot_scaled,
               a.nsq AS norm_a, b.nsq AS norm_b
        FROM n a JOIN n b
          ON a.vec_id < b.vec_id
         AND (a.k0 = b.k0 OR a.k1 = b.k1 OR a.k2 = b.k2 OR a.k3 = b.k3)
    )
    SELECT vec_a, vec_b, dot_scaled, norm_a, norm_b
    FROM p
    WHERE dot_scaled > 0
      AND dot_scaled::HUGEINT * dot_scaled * 10000
          >= {COS_THRESHOLD_SQ_X10000}::HUGEINT * norm_a * norm_b
    """,
    doc="per-LSH-band bucketed cosine near-dup: banded hyperplane "
    "candidates, exact-int verify inside each bucket",
    survey_ref="training-pipeline ops (cosine near-dup, LSH scale path)",
)
def dedup_embedding_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10^9-vector path: candidates are pairs sharing at least one
    hyperplane band; each (band, key) bucket runs the exact int64
    matmul kernel via ``groupBy().applyInPandas`` — work is
    O(sum of bucket^2), not O(N^2), and the bucket key doubles as the
    partition key so no task ever sees more than one bucket.

    A pair colliding in several bands is emitted ONCE: the kernel has
    both vectors' full band signatures and only emits from the FIRST
    band where they agree — dedup without a distinct/shuffle pass.
    The DuckDB oracle states the same candidate semantics relationally
    (OR over band-key equalities), so the check is exact, including
    LSH recall behavior."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", int_vec().alias("iv")
    ).withColumn("sig", band_keys(F.col("iv")))
    exploded = e.select(
        "vec_id", "iv", "sig", F.posexplode("sig").alias("band", "key")
    )

    def run(pdf):
        import numpy as np
        import pandas as pd

        cols = ["vec_a", "vec_b", "dot_scaled", "norm_a", "norm_b"]
        if len(pdf) < 2:
            return pd.DataFrame(columns=cols)
        band = int(pdf["band"].iloc[0])
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["iv"]), dtype=np.int64)
        sigs = np.array(list(pdf["sig"]), dtype=np.int64)
        rows = _pair_kernel_rows(ids, mat, ids, mat, require_lt=True)
        # first-collide-band dedup: emit only pairs whose FIRST agreeing
        # band is this one (vectorized signature compare)
        idx = {int(v): i for i, v in enumerate(ids)}
        out = []
        for u, v, d, na, nb in rows:
            su, sv = sigs[idx[u]], sigs[idx[v]]
            agree = np.nonzero(su == sv)[0]
            if len(agree) and int(agree[0]) == band:
                out.append((u, v, d, na, nb))
        return pd.DataFrame(out, columns=cols)

    return exploded.groupBy("band", "key").applyInPandas(run, _PAIR_SCHEMA)


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


@register(
    "ann_hard_negatives",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, {_IVEC_SQL} AS iv FROM embeddings
    ), n AS (
        SELECT vec_id, label, iv, {_NORM_SQL} AS nsq FROM e
    ), scored AS (
        SELECT q.vec_id AS query_id, q.label AS query_label,
               b.vec_id AS neighbor_id, b.label AS neighbor_label,
               {_dot_sql('q.iv', 'b.iv')} AS dot_scaled,
               q.nsq AS norm_q, b.nsq AS norm_b
        FROM n q JOIN n b ON b.label <> q.label
        WHERE q.vec_id < {N_QUERIES}
    ), ranked AS (
        SELECT query_id, query_label, neighbor_id, neighbor_label, dot_scaled,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY {_COS_SQL} DESC, neighbor_id ASC
               ) AS rank
        FROM scored
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label, rank, dot_scaled
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="hard-negative mining for contrastive training: per query "
    "vector, the top-k most-cosine-similar vectors with a DIFFERENT "
    "label — the near-misses that make the strongest negatives "
    "(in-batch negatives miss them); exact-int dot products, same "
    "discipline as ann_topk_cosine",
    survey_ref="training-pipeline ops: the negative-sampling leg "
    "beside ann_topk_cosine (retrieval) and semdedup_cluster_prune "
    "(positives); e.g. DPR/ANCE-style mining, Karpukhin et al. 2020",
)
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same plan as ann_topk_cosine — broadcast query side, label
    disequality fused into the join condition so same-label pairs never
    materialize, per-query top-k window. At corpus scale the scan side
    streams once; swap the brute-force candidate set for the LSH-banded
    one (dedup_embedding_cosine_lsh) when N makes exact all-query scoring
    too hot."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", int_vec().alias("iv")
    )
    n = e.select("vec_id", "label", "iv", _norm_sq(F.col("iv")).alias("nsq"))
    q = n.where(F.col("vec_id") < N_QUERIES).alias("q")
    b = n.alias("b")
    scored = (
        F.broadcast(q)
        .join(b, F.col("b.label") != F.col("q.label"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("q.label").alias("query_label"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.col("b.label").alias("neighbor_label"),
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
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            "rank", "dot_scaled",
        )
    )
