"""Retrieval scoring: BM25 top-k search over the document corpus.

Training-data curation constantly runs *retrieval* passes over the
corpus — "find the documents most relevant to these probe terms"
(targeted decontamination, topic-slice extraction, quality-probe
sampling). TF-IDF (``text_tfidf_top_terms``) ranks terms *within* a
document; BM25 ranks *documents against a query*, adding the two
things tf-idf misses: term-frequency saturation (k1) and document-
length normalization (b).

Exactness discipline: the standard BM25 uses ``ln`` in the IDF and
float division in the length norm — neither is bit-specified across
libms, so the whole computation is carried as EXACT INTEGERS instead
(the ``text_unigram_surprisal`` trick, generalized):

* Robertson IDF ``ln((N-df+0.5)/(df+0.5))`` -> scaled *rational*
  surrogate ``idf_s = ((2(N-df)+1) * S) // (2df+1)`` — same ordering
  (the log is monotone in its argument), no transcendentals.
* The length-normalized TF with k1=6/5, b=3/4 is an exact rational in
  (tf, dl, N, sum_dl); cross-multiplying by ``10 * sum_dl * N``
  clears every denominator:

      tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)      avgdl = sum_dl/N
    = 22*tf*sum_dl / (10*tf*sum_dl + 3*sum_dl + 9*N*dl)   (x10*sum_dl, x... )

  scaled by S before the floor-division so the quotient keeps 6
  digits. Both engines do the identical int64 ops -> identical hashes.

Overflow bound: ``idf_s * tnorm_s < (2N+1)*S * 2.2*S`` — with S=10^6
safe to N ~ 2*10^6 docs per partition-local magnitude; beyond that,
widen the two multiplications to DECIMAL(38,0) (both engines support
it exactly) — noted inline.

Scale shape: identical to the tf-idf plan (one (doc,term) shuffle,
map-side-combined df agg, a broadcast 2-scalar corpus row) — BUT the
probe-term filter lands BEFORE the tf shuffle, so only matching
(doc, term) pairs travel; with q query terms the shuffle carries
O(q * match_docs) rows, not O(corpus tokens). The df join is on <=q
keys and broadcast.

Reference parity: the reference has no retrieval op (BigQuery SEARCH
did not exist for it); this extends the training-pipeline surface the
task brief lists (quality scoring / decontamination probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register

#: scaled-integer unit for the two rational surrogates
_S = 1_000_000
#: probe query (terms from the corpus vocabulary); a real deployment
#: parameterizes this — kept literal so the oracle is self-contained
QUERY_TERMS = ["join", "vector", "stream", "window"]
_TOPK = 20

_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)


@register(
    "bm25_search_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), dl AS (
        SELECT doc_id, COUNT(*)::BIGINT AS dl
        FROM toks WHERE term <> '' GROUP BY doc_id
    ), corpus AS (
        SELECT COUNT(*)::BIGINT AS n_docs, SUM(dl)::BIGINT AS sum_dl FROM dl
    ), tf AS (
        SELECT doc_id, term, COUNT(*)::BIGINT AS tf
        FROM toks WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term
    ), scored AS (
        SELECT tf.doc_id,
               ((2 * (c.n_docs - dfreq.df) + 1) * {_S}) // (2 * dfreq.df + 1)
                   AS idf_s,
               ({_S} * 22 * tf.tf * c.sum_dl)
                   // (10 * tf.tf * c.sum_dl + 3 * c.sum_dl
                       + 9 * c.n_docs * dl.dl) AS tnorm_s
        FROM tf
        JOIN dfreq USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN corpus c
    ), agg AS (
        SELECT doc_id,
               SUM(idf_s * tnorm_s // {_S})::BIGINT AS score_s,
               COUNT(*)::BIGINT AS n_terms_hit
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, score_s, n_terms_hit
    FROM agg
    ORDER BY score_s DESC, doc_id ASC
    LIMIT {_TOPK}
    """,
    doc="BM25 top-k document retrieval for a probe-term query: exact "
    "integer rational surrogates for IDF and the k1/b length norm (no "
    "ln, no float division) — term filter pushed below the tf shuffle",
    survey_ref="training-pipeline ops (retrieval probe / targeted "
    "decontamination); W1 ORDER BY+LIMIT; tf-idf sibling "
    "text_tfidf_top_terms",
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: tokens exploded once; dl agg and the term-filtered tf agg
    are two branches of the same scan (Spark reuses the exchange for
    neither — they shuffle on doc_id and (doc_id, term) respectively,
    both map-side combined). dfreq (<= |query| rows) and the corpus
    scalars broadcast; final ordering is a top-k (TakeOrderedAndProject
    — no global sort). For corpora beyond ~2*10^6 docs, widen the two
    integer multiplications to DECIMAL(38,0) — same values, no wrap."""
    from ethereum_etl_airflow_spark.functions.text import tokens_col

    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col()).alias("term")).where(
        F.col("term") != ""
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toks.where(F.col("term").isin(QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.expr(f"((2 * (n_docs - df) + 1) * {_S}) DIV (2 * df + 1)").alias(
                "idf_s"
            ),
            F.expr(
                f"({_S} * 22 * tf * sum_dl) DIV "
                "(10 * tf * sum_dl + 3 * sum_dl + 9 * n_docs * dl)"
            ).alias("tnorm_s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum(F.expr(f"idf_s * tnorm_s DIV {_S}")).alias("score_s"),
            F.count("*").alias("n_terms_hit"),
        )
        .orderBy(F.desc("score_s"), F.asc("doc_id"))
        .limit(_TOPK)
    )
