"""Dataset-drift and per-group selection operators.

``vocab_drift_splits`` compares the token distribution of the train
split against the held-out split and surfaces the most divergent
terms — the standard pre-training sanity check that a split rule did
not skew vocabulary (and, run across dataset VERSIONS instead of
splits, the drift monitor for an evolving CDC-maintained corpus).

The divergence score is exact integer cross-multiplication
``|count_a * total_b - count_b * total_a|`` (the sign pattern of the
rate difference ``count_a/total_a - count_b/total_b`` scaled by
``total_a*total_b``), computed in DECIMAL(38,0): no floating-point
ratio ever forms, so Spark and DuckDB rank identically with no
last-ulp ties. At 10^12-token corpora the products reach ~10^26 —
past int64, inside decimal38.

``quality_topk_per_source`` is the per-group top-k selection shape
(rank window, deterministic tiebreak) used to cap each source's
contribution by quality rather than by hash.

Scale notes (100 TB):
* drift: one explode + one hash agg keyed by term (map-side combine
  collapses within-partition duplicates), scalar totals via a second
  tiny agg broadcast back — no global window, no single-task sort;
  the final top-k is TakeOrdered (driver holds k rows only).
* top-k per source: one shuffle on source; the rank window scans
  each group once. Hot sources are bounded by the same salting
  pattern as the as-of join if a source dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ethereum_etl_airflow_spark.functions.hashing import phash60, phash60_sql
from ethereum_etl_airflow_spark.queries import _t, register

#: terms reported by the drift query
DRIFT_TOP_K = 20

#: per-source survivor count for top-k selection
TOPK_PER_SOURCE = 5


@register(
    "vocab_drift_splits",
    oracle=f"""
    WITH tagged AS (
        SELECT CASE WHEN {phash60_sql('doc_id::VARCHAR')} % 100 < 80
                    THEN 'a' ELSE 'b' END AS split,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    counts AS (
        SELECT term,
               COUNT(*) FILTER (split = 'a') AS count_a,
               COUNT(*) FILTER (split = 'b') AS count_b
        FROM tagged GROUP BY term
    ),
    tot AS (
        SELECT SUM(count_a) AS total_a, SUM(count_b) AS total_b FROM counts
    )
    SELECT term, count_a, count_b, divergence::DOUBLE AS divergence
    FROM (
        SELECT term, count_a, count_b,
               abs(CAST(count_a AS DECIMAL(38,0)) * total_b
                   - CAST(count_b AS DECIMAL(38,0)) * total_a) AS divergence
        FROM counts, tot
        ORDER BY divergence DESC, term
        LIMIT {DRIFT_TOP_K}
    )
    """,
    doc="most vocabulary-divergent terms between the 80/20 hash splits "
    "(exact integer cross-multiplied rate difference — no float ranks)",
    survey_ref="training-pipeline ops: split/version drift monitor for "
    "the CDC-maintained token corpus; extends the reference's "
    "cross-table reconciliation checks (verify/sqls) to distributions",
)
def vocab_drift_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode once, tag the split, ONE term-keyed hash aggregation
    with conditional counts (map-side combine), scalar totals as a
    1-row broadcast cross join (never a global window — that funnels
    the term table through one task), exact decimal score, TakeOrdered
    top-k. Two exchanges total at any corpus size."""
    d = _t(spark, sf_dir, "documents")
    split = F.when(
        phash60(F.col("doc_id").cast("string")) % 100 < 80, "a"
    ).otherwise("b")
    tagged = d.select(
        split.alias("split"), F.explode(F.split("text", " ")).alias("term")
    )
    counts = tagged.groupBy("term").agg(
        F.count_if(F.col("split") == "a").alias("count_a"),
        F.count_if(F.col("split") == "b").alias("count_b"),
    )
    tot = counts.agg(
        F.sum("count_a").alias("total_a"), F.sum("count_b").alias("total_b")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "term",
            "count_a",
            "count_b",
            F.abs(
                F.col("count_a").cast("decimal(38,0)") * F.col("total_b")
                - F.col("count_b").cast("decimal(38,0)") * F.col("total_a")
            ).alias("divergence"),
        )
        .orderBy(F.desc("divergence"), "term")
        .limit(DRIFT_TOP_K)
        .withColumn("divergence", F.col("divergence").cast("double"))
    )


@register(
    "quality_topk_per_source",
    oracle=f"""
    SELECT source, doc_id, n_chars, rk
    FROM (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    )
    WHERE rk <= {TOPK_PER_SOURCE}
    """,
    doc=f"top-{TOPK_PER_SOURCE} documents per source by size with "
    "deterministic tiebreak — the per-group selection cap",
    survey_ref="§2.6 W1 top-k generalized per group; training-pipeline "
    "ops: cap each source's contribution by quality rank instead of "
    "hash (complements corpus_stratified_sample)",
)
def quality_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on source; rank window streams each group once.
    ROW_NUMBER with the (metric DESC, key) composite order is fully
    deterministic — no ANY_VALUE-style nondeterminism survives into
    the result."""
    d = _t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    return (
        d.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= TOPK_PER_SOURCE)
    )
