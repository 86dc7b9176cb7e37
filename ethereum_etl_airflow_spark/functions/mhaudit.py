"""MinHash estimator calibration audit: estimated vs exact Jaccard
on the LSH candidate pairs.

The MinHash identity — P[min-hash agrees] = Jaccard(a, b) — is what
makes ``dedup_minhash_lsh`` a faithful dedup at scale, but a pipeline
must be able to MEASURE that its K-permutation estimator is
calibrated on its own corpus before trusting banding thresholds (the
same audit-the-approximation discipline as ``ann_recall_audit``,
which audits the LSH-bucketed ANN against brute force). This query
emits, per band-collision candidate pair: the signature agreement
count (estimate numerator), the exact shingle intersection/union
sizes, and both similarity values — the calibration scatter an
operator reads off before tightening or loosening LSH_BANDS.

Exactness: signatures come from the portable md5 permutation family
(functions/hashing.py), so agreement counts are bit-identical across
engines; intersections/unions are exact integers; the two similarity
columns each perform exactly ONE double division (house float rule).

Scale notes (100 TB): identical movement profile to
dedup_minhash_lsh itself — signatures fold shuffle-free per doc, only
band keys enter the candidate join, and the audit arithmetic (zip_with
agreement, array_intersect) runs post-join on candidate pairs only
(≈ duplicates + band false positives, vanishingly small vs N²). The
estimate needs NO extra data over the dedup pass: signatures ride
along with the shingle arrays already joined for exact verification.

Reference parity: the reference audits its own pipeline with
cross-table reconciliation checks (verify/sqls/
transactions_count.sql — Σ column vs COUNT of sibling table); this is
the same reconcile-two-derivations shape applied to the sketch.
SURVEY §2.4 A5, LLM-data-pipeline dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.dedup_sql import (
    _SHINGLES_SQL,
    _sig_sql,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
)
from ethereum_etl_airflow_spark.queries import _t, register


@register(
    "minhash_estimate_audit",
    oracle=f"""
    WITH t AS ({_SHINGLES_SQL}),
    sig AS (
        SELECT doc_id, sh, {_sig_sql()} AS sig FROM t
    ),
    bands AS (
        SELECT doc_id, b,
               array_to_string(sig[{LSH_ROWS}*b + 1 : {LSH_ROWS}*b + {LSH_ROWS}], '-') AS band_key
        FROM sig, (SELECT unnest(generate_series(0, {LSH_BANDS - 1})) AS b)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(list_sum(list_transform(range(1, {MINHASH_K + 1}),
                i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
                AS BIGINT) AS sig_matches,
           CAST(list_sum(list_transform(range(1, {MINHASH_K + 1}),
                i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
                AS DOUBLE) / {MINHASH_K} AS est_jaccard,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_common,
           CAST(len(list_distinct(sa.sh || sb.sh)) AS BIGINT) AS n_union,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
               / len(list_distinct(sa.sh || sb.sh)) AS exact_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
    """,
    doc="MinHash calibration audit on band-collision pairs: "
    "K-permutation agreement count + est_jaccard (matches/K) against "
    "exact shingle intersection/union + exact_jaccard; ONE double "
    "division per similarity column, all else exact integers",
    survey_ref="reconcile-two-derivations verify shape "
    "(verify/sqls/transactions_count.sql, SURVEY §2.4 A5); audits "
    "dedup_minhash_lsh's estimator like ann_recall_audit audits ANN",
)
def minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature fold + band join exactly as the dedup pass; the audit
    arithmetic runs only on candidate pairs."""
    # function-level import: dedup.py is a registration module (leaf
    # rule — see veclib.py docstring)
    from ethereum_etl_airflow_spark.functions.dedup import (
        lsh_bands,
        minhash_sig_col,
        shingles_col,
    )

    d = _t(spark, sf_dir, "documents").where(F.size(F.split("text", " ")) >= 3)
    sh = d.select("doc_id", shingles_col(F.split("text", " ")).alias("sh"))
    sigs = sh.select("doc_id", "sh", minhash_sig_col().alias("sig"))
    bands = lsh_bands(sigs)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa, sb = sigs.alias("sa"), sigs.alias("sb")
    matches = F.aggregate(
        F.zip_with(
            F.col("sa.sig"),
            F.col("sb.sig"),
            lambda x, y: F.when(x == y, 1).otherwise(0).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_common = F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh"))).cast(
        "long"
    )
    n_union = F.size(
        F.array_distinct(F.concat(F.col("sa.sh"), F.col("sb.sh")))
    ).cast("long")
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            matches.alias("sig_matches"),
            (matches.cast("double") / MINHASH_K).alias("est_jaccard"),
            n_common.alias("n_common"),
            n_union.alias("n_union"),
            (n_common.cast("double") / n_union).alias("exact_jaccard"),
        )
    )
