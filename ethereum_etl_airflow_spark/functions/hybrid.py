"""Hybrid retrieval: reciprocal-rank fusion of a sparse and a dense leg.

Modern curation retrieval is HYBRID: a lexical ranker (tf-idf/BM25)
catches exact terminology, an embedding ranker catches paraphrase, and
the two candidate lists are fused.  Reciprocal Rank Fusion (Cormack,
Clarke & Buettcher, SIGIR'09 — public literature) is the standard
score-free fusion: ``score(d) = Σ_legs 1/(K + rank_leg(d))``, immune
to the two legs' incomparable score scales because only RANKS cross
the boundary.

Exactness discipline (house rules): the fused score is the scaled
integer ``S // (K + r_sparse) + S // (K + r_dense)`` — floor division
of int64s, bit-identical in both engines, monotone in the true RRF
value at S=10^9 for ranks ≤ leg depth.  The sparse leg is the exact
integer tf·idf surrogate (``bm25_search_topk``'s idf_s without the
length norm); the dense leg orders by the exact-int dot products of
``veclib`` (query = vector 0, query-by-example).

Scale shape: each leg is already a bounded top-``_LEG_K`` list (a
per-leg TakeOrderedAndProject — no global sort), so the fusion join
moves ≤ 2·_LEG_K rows TOTAL regardless of corpus size; a full outer
join on doc_id with missing-leg contribution 0, then a final top-k.
At 10^9 docs the legs dominate (one tf shuffle; one broadcast-query
dot-product scan) and the fusion cost stays constant.

Reference parity: no retrieval surface in the reference (SURVEY §2
additions); legs are the registered ``bm25_search_topk`` /
``ann_topk_cosine`` families, fusion is this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.veclib import (
    _IVEC_SQL,
    _dot,
    _dot_sql,
    int_vec,
)
from ethereum_etl_airflow_spark.queries import _t, register

#: RRF smoothing constant (the SIGIR'09 default)
_K = 60
#: scaled-integer unit for the fused score
_S = 1_000_000_000
#: per-leg candidate depth
_LEG_K = 100
#: final fused list size
_TOPK = 20
#: sparse probe (corpus-vocabulary terms, matching bm25_search_topk)
_TERMS = ["join", "vector", "stream", "window"]
#: scaled-integer unit for the sparse idf surrogate
_S_IDF = 1_000_000

_TERMS_SQL = ", ".join(f"'{t}'" for t in _TERMS)


@register(
    "retrieval_hybrid_rrf",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*)::BIGINT AS tf
        FROM toks WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term
    ), ndocs AS (
        SELECT COUNT(*)::BIGINT AS n FROM documents
    ), sparse AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score_s DESC, doc_id ASC)
                   AS r_sparse
        FROM (
            SELECT tf.doc_id,
                   SUM(tf.tf * (((2 * (n.n - dfreq.df) + 1) * {_S_IDF})
                       // (2 * dfreq.df + 1)))::BIGINT AS score_s
            FROM tf JOIN dfreq USING (term) CROSS JOIN ndocs n
            GROUP BY tf.doc_id
        ) QUALIFY r_sparse <= {_LEG_K}
    ), e AS (
        SELECT vec_id, {_IVEC_SQL} AS iv FROM embeddings
    ), dense AS (
        SELECT vec_id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY dot_scaled DESC, vec_id ASC)
                   AS r_dense
        FROM (
            SELECT b.vec_id, {_dot_sql('q.iv', 'b.iv')} AS dot_scaled
            FROM e b CROSS JOIN (SELECT iv FROM e WHERE vec_id = 0) q
            WHERE b.vec_id <> 0
        ) QUALIFY r_dense <= {_LEG_K}
    ), fused AS (
        SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
               s.r_sparse, d.r_dense,
               coalesce({_S} // ({_K} + s.r_sparse), 0)
               + coalesce({_S} // ({_K} + d.r_dense), 0) AS rrf_s
        FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
    )
    SELECT doc_id, rrf_s, r_sparse, r_dense
    FROM fused
    ORDER BY rrf_s DESC, doc_id ASC
    LIMIT {_TOPK}
    """,
    doc="hybrid retrieval via reciprocal-rank fusion: exact-integer "
    "tf-idf sparse leg + exact-int-dot dense leg (query-by-example), "
    "fused as S//(K+rank) scaled integers — only bounded top-K rank "
    "lists cross the fusion boundary",
    survey_ref="training-pipeline retrieval ops; legs = "
    "bm25_search_topk / ann_topk_cosine families, fusion per "
    "Cormack et al. SIGIR'09",
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each leg ends in a rank window over a bounded candidate set
    (sparse: only probe-term matches survive the tf shuffle; dense:
    broadcast 1-row query against a narrow scan), so the full outer
    fusion join sees ≤ 2·_LEG_K rows — constant work above the legs.
    ql/dl note: sqrt-free — the dense ordering needs only dot products
    because the query norm is constant across candidates and candidate
    norms are omitted deliberately (inner-product retrieval, MIPS)."""
    from ethereum_etl_airflow_spark.functions.text import tokens_col

    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col()).alias("term")).where(
        F.col("term").isin(_TERMS)
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.groupBy().agg(F.count("*").alias("n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf")
                * F.expr(f"((2 * (n - df) + 1) * {_S_IDF}) DIV (2 * df + 1)")
            ).alias("score_s")
        )
    )
    # top-k FIRST (TakeOrderedAndProject — distributed heap, no global
    # sort); the rank window then runs over ≤ _LEG_K rows
    w_s = W.orderBy(F.desc("score_s"), F.asc("doc_id"))
    sparse = (
        scored.orderBy(F.desc("score_s"), F.asc("doc_id"))
        .limit(_LEG_K)
        .withColumn("r_sparse", F.row_number().over(w_s).cast("long"))
        .select("doc_id", "r_sparse")
    )

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", int_vec().alias("iv")
    )
    q = e.where(F.col("vec_id") == 0).select(F.col("iv").alias("qiv"))
    dots = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            _dot(F.col("qiv"), F.col("iv")).alias("dot_scaled"),
        )
    )
    w_d = W.orderBy(F.desc("dot_scaled"), F.asc("doc_id"))
    dense = (
        dots.orderBy(F.desc("dot_scaled"), F.asc("doc_id"))
        .limit(_LEG_K)
        .withColumn("r_dense", F.row_number().over(w_d).cast("long"))
        .select("doc_id", "r_dense")
    )

    contrib = lambda name: F.coalesce(  # noqa: E731
        F.expr(f"{_S} DIV ({_K} + {name})"), F.lit(0).cast("long")
    )
    fused = sparse.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        (contrib("r_sparse") + contrib("r_dense")).alias("rrf_s"),
        "r_sparse",
        "r_dense",
    )
    return fused.orderBy(F.desc("rrf_s"), F.asc("doc_id")).limit(_TOPK)
