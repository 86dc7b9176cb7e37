"""DSIR-style data selection: hashed-n-gram importance weights.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) scores every raw document by how much more likely
its n-gram bag is under a TARGET distribution (e.g. curated text)
than under the RAW corpus distribution, then resamples by that
weight. It is the standard pretraining-corpus targeting pass and is
pure relational algebra: two term-frequency tables and a per-doc sum
of per-term log ratios.

House integer-bits discipline (same trick as text_unigram_surprisal):
the per-term log ratio

    log2 p_tgt(term) - log2 p_raw(term)

is kept in whole bits as the difference of two exact integer
surprisals, ``bits_X = floor(log2((T_X + V) / (c_X + 1)))`` with
add-one smoothing over the joint vocabulary V (so terms unseen in the
target get a finite penalty instead of -inf). ``floor(log2 n)`` is
``bit_length(n) - 1`` — `length(bin(n)) - 1` on both engines — so the
score ``dsir_bits = Σ_term (bits_raw - bits_tgt)`` is bit-for-bit
reproducible; only the final per-token mean divides as a double.

Here the target distribution is the ``lang = 'en'`` slice of the
corpus (a stand-in for "curated high-quality subset"; any predicate
works). A raw document scoring high reads "more target-like than the
corpus average" — the resampling weight.

Scale notes (100 TB): ONE token explode feeds ONE term aggregate that
computes raw and target counts together (the target count is a
conditional sum — no second scan, no join of two frequency tables);
the totals are a 1-row broadcast; scoring joins the zipf-skewed token
stream against the (tiny, ≤|vocab|) scored dictionary — AQE broadcasts
it — and the per-doc agg shuffles only doc-sized partials. Identical
shape to the surprisal query, whose plan is already pinned scale-safe.

Reference parity: the reference's seed/amend stage overrides derived
data from a curated side input (build_amend_dag.py:18) — DSIR is the
statistical generalization: weight raw rows by a curated target.
SURVEY §2.4 A1 (conditional agg), training-pipeline ops (quality
scoring family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register


@register(
    "dsir_importance_weights",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    t2 AS (SELECT doc_id, lang, term FROM toks WHERE term <> ''),
    c AS (
        SELECT term,
               CAST(COUNT(*) AS BIGINT) AS c_raw,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS c_tgt
        FROM t2 GROUP BY term
    ),
    tot AS (
        SELECT CAST(SUM(c_raw) AS BIGINT) AS t_raw,
               CAST(SUM(c_tgt) AS BIGINT) AS t_tgt,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM c
    ),
    s AS (
        SELECT term,
               CAST(length(bin((t_raw + v) // (c_raw + 1))) - 1 AS BIGINT)
                   AS bits_raw,
               CAST(length(bin((t_tgt + v) // (c_tgt + 1))) - 1 AS BIGINT)
                   AS bits_tgt
        FROM c CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(bits_raw - bits_tgt) AS BIGINT) AS dsir_bits,
           CAST(SUM(bits_raw - bits_tgt) AS DOUBLE) / COUNT(*)
               AS mean_dsir_bits
    FROM t2 JOIN s USING (term)
    GROUP BY doc_id
    """,
    doc="DSIR importance weights in whole bits: per-term "
    "floor-log2(p_target/p_raw) as the difference of two smoothed "
    "integer surprisals (add-one over the joint vocab), summed per "
    "document; target = the lang='en' slice. High dsir_bits = more "
    "target-like than the corpus average — the resampling weight",
    survey_ref="DSIR (arXiv:2302.03169, public method); seed/amend "
    "curated-override analogue build_amend_dag.py:18; integer-bits "
    "discipline shared with text_unigram_surprisal",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One explode; ONE term agg producing raw+target counts together
    (conditional sum — the two frequency tables never materialize
    separately); 1-row totals broadcast; scored dictionary broadcast
    back onto the token stream; per-doc agg. No window, no sort."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    counts = toks.groupBy("term").agg(
        F.count("*").alias("c_raw"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("c_tgt"),
    )
    tot = counts.agg(
        F.sum("c_raw").alias("t_raw"),
        F.sum("c_tgt").alias("t_tgt"),
        F.count("*").alias("v"),
    )

    def _bits(total, c):
        return (
            F.length(F.bin(F.expr(f"({total} + v) div ({c} + 1)"))) - 1
        ).cast("long")

    scored = counts.crossJoin(F.broadcast(tot)).select(
        "term",
        _bits("t_raw", "c_raw").alias("bits_raw"),
        _bits("t_tgt", "c_tgt").alias("bits_tgt"),
    )
    return (
        toks.join(scored, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.col("bits_raw") - F.col("bits_tgt")).alias("dsir_bits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "dsir_bits",
            (F.col("dsir_bits").cast("double") / F.col("n_tokens")).alias(
                "mean_dsir_bits"
            ),
        )
    )
