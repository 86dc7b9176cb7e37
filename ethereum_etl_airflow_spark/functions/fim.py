"""Fill-in-the-middle (FIM) transform: deterministic PSM reordering.

FIM training (Bavarian et al. 2022, "Efficient Training of Language
Models to Fill in the Middle", arXiv:2207.14255) rewrites a random
half of the corpus from autoregressive order into
Prefix-Suffix-Middle order: pick two cut points, then emit

    <PRE> prefix <SUF> suffix <MID> middle

so the model learns to infill conditioned on both sides. At corpus
scale the "randomness" must be a pure function of the document —
reruns, retries, and the DuckDB oracle must all pick the SAME docs
and the SAME cuts (the spanmask.py discipline).

* **document selection**: doc is FIM-transformed iff
  ``phash60(doc_id:fim) % 2 == 0`` and it has >= 3 tokens (the paper's
  50% FIM rate); other docs pass through in AR order unchanged.
* **cut points**: two independent draws over the n+1 boundary slots,
  ``lo = min(h_a, h_b) % (n+1)``-style — exactly
  ``a = phash60(doc_id:a) % (n+1)``, ``b = phash60(doc_id:b) % (n+1)``,
  ``lo = least(a,b)``, ``hi = greatest(a,b)``. Empty prefix / middle /
  suffix are legal (the paper keeps them; sentinels still anchor the
  format).

The whole rewrite is concat-of-slices inside ONE whole-stage-codegen
projection: zero shuffles at any corpus size, and the parquet scan
reads exactly (doc_id, text).

Reference parity: derived-extract discipline (filter + deterministic
transform + project) of the parse stage — dags/ethereum_parse_dag.py's
per-table rewrite jobs; SURVEY §2.9 training-data extension family
(sibling of corpus_span_corruption / corpus_chunk_overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.hashing import phash60, phash60_sql
from ethereum_etl_airflow_spark.queries import _t, register

#: sentinel tokens (kept as plain vocabulary items in both engines)
_PRE, _SUF, _MID = "<PRE>", "<SUF>", "<MID>"


def _draw(doc_id, tag: str):
    """Deterministic 60-bit draw bound to (doc, tag) — stateless."""
    return phash60(F.concat(doc_id.cast("string"), F.lit(f":{tag}")))


def fim_transform(docs: DataFrame, tokens_expr) -> DataFrame:
    """documents -> (doc_id, n_tokens, fim_applied, n_middle, out_tokens)."""
    d = docs.select("doc_id", tokens_expr.alias("toks"))
    doc, n = F.col("doc_id"), F.size("toks")
    applied = (_draw(doc, "fim") % 2 == 0) & (n >= 3)
    a = _draw(doc, "a") % (n + 1)
    b = _draw(doc, "b") % (n + 1)
    lo, hi = F.least(a, b), F.greatest(a, b)
    psm = F.concat(
        F.array(F.lit(_PRE)),
        F.slice("toks", F.lit(1), lo),
        F.array(F.lit(_SUF)),
        F.slice("toks", hi + 1, n - hi),
        F.array(F.lit(_MID)),
        F.slice("toks", lo + 1, hi - lo),
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        applied.alias("fim_applied"),
        F.when(applied, (hi - lo).cast("long")).otherwise(F.lit(0).cast("long")).alias(
            "n_middle"
        ),
        F.when(applied, psm).otherwise(F.col("toks")).alias("out_tokens"),
    )


@register(
    "corpus_fim_transform",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ), cuts AS (
        SELECT doc_id, toks, n,
               ({phash60_sql("doc_id::VARCHAR || ':fim'")} % 2 = 0
                AND n >= 3) AS applied,
               {phash60_sql("doc_id::VARCHAR || ':a'")} % (n + 1) AS a,
               {phash60_sql("doc_id::VARCHAR || ':b'")} % (n + 1) AS b
        FROM t
    ), lohi AS (
        SELECT doc_id, toks, n, applied,
               least(a, b) AS lo, greatest(a, b) AS hi
        FROM cuts
    )
    SELECT doc_id,
           n::BIGINT AS n_tokens,
           applied AS fim_applied,
           (CASE WHEN applied THEN hi - lo ELSE 0 END)::BIGINT AS n_middle,
           CASE WHEN applied THEN
               ['{_PRE}'] || list_slice(toks, 1, lo)
               || ['{_SUF}'] || list_slice(toks, hi + 1, n)
               || ['{_MID}'] || list_slice(toks, lo + 1, hi)
           ELSE toks END AS out_tokens
    FROM lohi
    """,
    doc="fill-in-the-middle PSM reordering (FIM, arXiv:2207.14255): a "
    "deterministic half of the corpus is rewritten <PRE> prefix <SUF> "
    "suffix <MID> middle with hash-drawn cut points over the n+1 "
    "boundary slots; doc selection and cuts are pure functions of "
    "doc_id so reruns and both engines agree token-for-token — one "
    "codegen projection, zero shuffles",
    survey_ref="training-pipeline ops (infilling-objective data prep; "
    "sibling of corpus_span_corruption, corpus_chunk_overlap)",
)
def corpus_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ethereum_etl_airflow_spark.functions.text import tokens_col

    return fim_transform(_t(spark, sf_dir, "documents"), tokens_col())
