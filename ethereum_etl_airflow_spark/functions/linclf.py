"""Hashed linear classifier inference — the fastText quality gate.

Production quality filters (GPT-3's WebText-vs-CommonCrawl classifier,
CCNet's, most "kept by classifier" corpus gates) are linear models over
HASHED n-gram features (Joulin et al. 2016 fastText; Weinberger et al.
2009 hashing trick): no vocabulary ships with the job — a token's
feature id IS a hash, and the model is one dense weight vector small
enough to live inside every task.

This operator runs that inference shape end-to-end with a
deterministic weight vector so both engines agree bit-for-bit:

* feature id:  ``phash60(tok) % V`` for unigrams,
  ``phash60(w1 || ' ' || w2) % V`` for bigrams (V = 1024 buckets);
* weight:      ``w(b) = phash60('w:' || b) % 2001 - 1000`` — an
  integer in [-1000, 1000], a stand-in for trained weights with the
  exact storage/latency profile of the real thing;
* doc score:   sum of weights over all unigram + bigram feature
  INSTANCES (fastText sums then normalizes; the mean over feature
  count is the one double, emitted last);
* gate:        ``keep = sum_w >= 0``.

Scale notes (100 TB): the whole scorer is two fused ``aggregate``
folds inside ONE codegen projection — no weight-table join (the
"table" is a hash function), no explode, no shuffle of any kind; the
parquet scan reads exactly (doc_id, text). That property is what makes
classifier gating effectively free next to the dedup passes.

Spark pitfall encoded here: ``sequence(1, n-1)`` DESCENDS when
n - 1 < 1 (sequence(1,0) = [1,0]), unlike DuckDB's empty
generate_series — the bigram fold is guarded by ``n >= 2``.

Reference parity: the P8/P9-family status-filter discipline (filter
rows by a computed predicate before downstream stages); SURVEY §2.9
training-data extension family (quality scoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.hashing import phash60, phash60_sql
from ethereum_etl_airflow_spark.queries import _t, register

#: hashed feature space (buckets) and weight range half-width
_V = 1024
_W = 1000


def _weight(feat_hash):
    """Deterministic integer weight in [-W, W] for a hashed feature."""
    b = (feat_hash % _V).cast("string")
    return phash60(F.concat(F.lit("w:"), b)) % (2 * _W + 1) - _W


def _weight_sql(feat_hash_expr: str) -> str:
    """Same weight as :func:`_weight`, as a DuckDB fragment."""
    h = phash60_sql(f"'w:' || ({feat_hash_expr} % {_V})::VARCHAR")
    return f"({h} % {2 * _W + 1} - {_W})"


_UNI_SQL = _weight_sql(phash60_sql("w"))
_BI_SQL = _weight_sql(phash60_sql("toks[i] || ' ' || toks[i + 1]"))


@register(
    "quality_hashed_linear_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ), scored AS (
        SELECT doc_id, n,
               coalesce(list_sum(list_transform(toks, w -> {_UNI_SQL})), 0)
               + coalesce(list_sum(list_transform(
                     generate_series(1, n - 1), i -> {_BI_SQL})), 0)
               AS sum_w,
               n + greatest(n - 1, 0) AS n_feats
        FROM t
    )
    SELECT doc_id,
           n::BIGINT AS n_tokens,
           sum_w::BIGINT AS sum_w,
           (sum_w >= 0) AS keep,
           sum_w::DOUBLE / n_feats AS mean_w
    FROM scored
    """,
    doc="fastText-style quality gate: hashed unigram+bigram features "
    "(hashing trick, V=1024) scored against a deterministic integer "
    "weight vector, keep = sum >= 0 — two fused aggregate folds in one "
    "codegen projection, zero shuffles, no weight-table join",
    survey_ref="training-pipeline ops (classifier quality filtering a la "
    "GPT-3/CCNet; sibling of text_quality_score and "
    "quality_filter_by_percentile); fastText Joulin et al. 2016",
)
def quality_hashed_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ethereum_etl_airflow_spark.functions.text import tokens_col

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens_col().alias("toks")
    )
    n = F.size("toks")
    zero = F.lit(0).cast("long")
    uni = F.aggregate(
        "toks", zero, lambda acc, w: acc + _weight(phash60(w))
    )
    bi_pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: _weight(
            phash60(
                F.concat(
                    F.element_at("toks", i),
                    F.lit(" "),
                    F.element_at("toks", i + 1),
                )
            )
        ),
    )
    bi = F.when(n >= 2, F.aggregate(bi_pairs, zero, lambda a, x: a + x)).otherwise(
        zero
    )
    scored = d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        (uni + bi).alias("sum_w"),
    )
    n_feats = F.col("n_tokens") + F.greatest(
        F.col("n_tokens") - 1, F.lit(0).cast("long")
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "sum_w",
        (F.col("sum_w") >= 0).alias("keep"),
        (F.col("sum_w").cast("double") / n_feats).alias("mean_w"),
    )
