"""Edit-distance near-dup verification: blocked Levenshtein pairs.

MinHash/SimHash answer "are these documents similar SETS of
shingles?"; some dedup policies (OCR noise, template fills, typo
variants) need the stricter SEQUENCE notion — bounded edit distance.
Exact all-pairs Levenshtein is O(N² · len²): unthinkable.  The
standard scalable shape (same blocking discipline as
``split_leakage_report``'s fingerprint family) is:

1. **Block** on a cheap deterministic key — here the 60-bit hash of
   the first ``_PREFIX`` tokens.  Edit-distance near-dups in corpus
   data overwhelmingly share their opening tokens (boilerplate heads,
   template openers), so the block key has high recall while cutting
   candidates from N² to Σ block².
2. **Verify** each within-block pair with a THRESHOLD-BOUNDED
   Levenshtein: Spark's ``levenshtein(l, r, k)`` runs the banded
   O(k·len) dynamic program and returns -1 when the distance exceeds
   k — at k=6 that is ~len·13 cells instead of len², and the common
   far-apart pair exits early.

Both sides stay JVM-side codegen (md5/conv for the block key, the
built-in Levenshtein for verify) — no Python in the pipeline.  At
100 TB the block join is one shuffle on the 60-bit key; block-size
skew is bounded by the df-cap discipline if a boilerplate head
explodes (not needed at test scale; see dedup.SHINGLE_DF_CAP for the
pattern).

Oracle: DuckDB's ``levenshtein`` computes the same unit-cost metric;
the oracle filters the unbounded distance ≤ k, which is value-equal
to Spark's banded form whenever it returns ≥ 0.

Reference parity: the reference dedups by key only
(amended_tokens.sql:3-10 ANY_VALUE); content near-dup surfaces are
part of this engine's training-data layer (SURVEY §2 additions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.hashing import phash60, phash60_sql
from ethereum_etl_airflow_spark.queries import _t, register

#: tokens in the blocking prefix (matches the leakage-audit family)
_PREFIX = 12
#: maximum edit distance for a verified near-dup pair
_EDIT_MAX = 6
#: skew guard: a block bigger than this is a boilerplate head, not a
#: near-dup family — drop it (the SHINGLE_DF_CAP discipline); a capped
#: block would otherwise put cap² banded DPs on one reducer
_BLOCK_CAP = 64


@register(
    "dedup_edit_distance",
    oracle=f"""
    WITH s0 AS (
        SELECT doc_id, text,
               {phash60_sql(
                   "array_to_string(string_split(text, ' ')[1:"
                   + str(_PREFIX) + "], ' ')"
               )} AS fp
        FROM documents
    ), s AS (
        SELECT doc_id, text, fp FROM (
            SELECT doc_id, text, fp,
                   COUNT(*) OVER (PARTITION BY fp) AS bc
            FROM s0
        ) WHERE bc <= {_BLOCK_CAP}
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           levenshtein(a.text, b.text)::BIGINT AS edit_dist
    FROM s a JOIN s b ON a.fp = b.fp AND a.doc_id < b.doc_id
    WHERE levenshtein(a.text, b.text) <= {_EDIT_MAX}
    """,
    doc="edit-distance near-dup pairs: block on the first-12-token "
    "hash, verify in-block pairs with a threshold-banded Levenshtein "
    "(O(k·len) per pair, -1 early-exit past k) — the sequence-level "
    "complement to the set-level MinHash family",
    survey_ref="training-pipeline dedup family (sequence metric); "
    "blocking sibling of split_leakage_report, verify sibling of "
    "dedup_ngram_jaccard",
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on the block key (self-equi-join); each surviving
    pair runs the banded DP once — Spark evaluates the bounded form,
    keeping pairs where it returns a non-negative distance ≤ k (the
    -1 sentinel encodes 'exceeded the band')."""
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    fp = phash60(F.array_join(F.slice(F.split("text", " "), 1, _PREFIX), " "))
    s0 = d.select("doc_id", "text", fp.alias("fp"))
    # block-size cap: the count window shares the fp partitioning the
    # join needs anyway — the guard costs no extra exchange
    s = (
        s0.withColumn("bc", F.count("*").over(W.partitionBy("fp")))
        .where(F.col("bc") <= _BLOCK_CAP)
        .drop("bc")
    )
    a = s.alias("a")
    b = s.alias("b")
    dist = F.levenshtein(F.col("a.text"), F.col("b.text"), _EDIT_MAX)
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            dist.cast("long").alias("edit_dist"),
        )
        .where(F.col("edit_dist") >= 0)
    )
