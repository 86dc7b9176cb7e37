"""Sketch operators: count-min heavy hitters, HyperLogLog distinct,
and an integer-bit unigram-LM surprisal scorer.

All three follow the repo's portable-math discipline (NOTES invariant
list): every intermediate is exact integer arithmetic on the portable
md5-family hash (``functions/hashing.phash60``), and any floating-point
value in the OUTPUT is produced by exactly ONE IEEE-754 division of two
exact integers — a single correctly-rounded operation both Spark and
DuckDB compute bit-identically. ``ln``/``pow`` never appear (libm last-
ulp drift would break the oracle hash compare), which is why the HLL
harmonic mean is kept as a scaled integer sum and the surprisal is
measured in whole bits (``floor(log2 T/c) = bit_length(T div c) - 1``).

Reference parity: the reference pipeline's verify stage runs exact
COUNT(DISTINCT)/SUM reconciliation SQL (dags/resources/stages/verify/);
these sketches are the sublinear-memory versions of the same checks
for when the key cardinality itself no longer fits an exact pass —
plus the quality-scoring leg of the training-data brief.

Scale notes (100 TB):
* CMS: the raw stream is first collapsed by an exact per-key hash agg
  (map-side combine does most of the work), so the sketch build costs
  one narrow 4x explode of the (much smaller) key dictionary and one
  (row, bucket)-keyed agg bounded by d*w rows. Counters are d*w = 1024
  rows total — always broadcast on the estimate join, never shuffled.
* HLL: one narrow map to (register, rho) then a 64-group agg —
  map-side combine reduces each partition to <= m rows before the
  exchange. Register state is m integers; merging sketches across
  partitions/tables is MAX per register (associative, shuffle-free).
* surprisal: term dictionary agg (map-side combined), 1-row total
  broadcast, then a term-keyed join back to the token stream — the
  same zipfian-join shape as tf-idf; AQE skew-split handles hot terms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.hashing import phash60, phash60_sql
from ethereum_etl_airflow_spark.queries import _t, register

#: count-min sketch geometry: d hash rows x w buckets. w is deliberately
#: small relative to the 150-key sf0.01 keyspace so collisions (and the
#: one-sided overcount they cause) are actually exercised by the oracle.
CMS_D = 4
CMS_W = 256

#: HLL geometry + estimator numerator live in the leaf module
#: functions/hll.py (shared with operators/table_stats.py).
from ethereum_etl_airflow_spark.functions.hll import HLL_B, HLL_M, HLL_NUM  # noqa: E402


def _cms_bucket(i: int, key: Column) -> Column:
    """Row-i CMS bucket of a string key (Spark side)."""
    return phash60(F.concat(F.lit(f"{i}:"), key)) % CMS_W


def _cms_bucket_sql(i_expr: str, key_expr: str) -> str:
    """Same bucket as :func:`_cms_bucket`, as a DuckDB fragment."""
    salted = i_expr + "::VARCHAR || ':' || " + key_expr
    return f"({phash60_sql(salted)} % {CMS_W})"


@register(
    "sketch_cms_heavy_hitters",
    oracle=f"""
    WITH c AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
        FROM events GROUP BY user_id
    ),
    k AS (
        SELECT user_id, exact_cnt, i AS row_i,
               {_cms_bucket_sql('i', 'user_id::VARCHAR')} AS bucket
        FROM c CROSS JOIN (SELECT unnest(range(0, {CMS_D})) AS i) t
    ),
    counters AS (
        SELECT row_i, bucket, CAST(SUM(exact_cnt) AS BIGINT) AS counter
        FROM k GROUP BY row_i, bucket
    )
    SELECT user_id, exact_cnt, MIN(counter) AS cms_est,
           MIN(counter) - exact_cnt AS overcount
    FROM k JOIN counters USING (row_i, bucket)
    GROUP BY user_id, exact_cnt
    """,
    doc=f"count-min sketch ({CMS_D}x{CMS_W}) frequency estimates for every "
    "event key next to the exact count — overcount is the sketch's "
    "one-sided collision error, never negative",
    survey_ref="training-pipeline ops: sublinear heavy-hitter counting; "
    "sketch version of the reference's verify-stage count reconciliation "
    "(dags/resources/stages/verify)",
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-key agg first (map-side combined), then the sketch is
    built from the key DICTIONARY, not the raw stream: a 4-wide
    posexplode and a (row, bucket) agg bounded by d*w rows. Estimates
    come from a broadcast join against the <=1024-row counter table —
    at any corpus size the only full-data pass is the first agg."""
    events = _t(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count("*").alias("exact_cnt"))
    key = F.col("user_id").cast("string")
    keyed = counts.select(
        "user_id",
        "exact_cnt",
        F.posexplode(
            F.array(*[_cms_bucket(i, key) for i in range(CMS_D)])
        ).alias("row_i", "bucket"),
    )
    counters = keyed.groupBy("row_i", "bucket").agg(
        F.sum("exact_cnt").alias("counter")
    )
    return (
        keyed.join(F.broadcast(counters), ["row_i", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("counter").alias("cms_est"))
        .select(
            "user_id",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        )
    )


@register(
    "approx_distinct_hll",
    oracle=f"""
    WITH h AS (
        SELECT {phash60_sql('user_id::VARCHAR')} AS h FROM events
    ),
    b AS (SELECT h % {HLL_M} AS idx, h >> 6 AS rest FROM h),
    r AS (
        SELECT idx,
               MAX(CASE WHEN rest > 0
                        THEN {HLL_B + 1} - length(bin(rest))
                        ELSE {HLL_B + 1} END) AS rho
        FROM b GROUP BY idx
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS regs_used,
               CAST(SUM(1::BIGINT << ({HLL_B + 1} - rho)) AS BIGINT) AS s_present
        FROM r
    ),
    e AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events
    )
    SELECT exact_distinct, regs_used,
           s_present + ({HLL_M} - regs_used) * (1::BIGINT << {HLL_B + 1})
               AS s_scaled,
           {HLL_NUM!r} / CAST(
               s_present + ({HLL_M} - regs_used) * (1::BIGINT << {HLL_B + 1})
               AS DOUBLE) AS est_hll
    FROM s CROSS JOIN e
    """,
    doc=f"HyperLogLog (m={HLL_M}) distinct-count estimate next to the exact "
    "count; the harmonic mean is kept as an exact scaled-integer sum and "
    "the estimate is one IEEE division — bit-identical cross-engine "
    "(Spark's approx_count_distinct sketch is engine-private, so this "
    "portable HLL is what an oracle can replay)",
    survey_ref="§2.5 A4 COUNT(DISTINCT) at sublinear memory; register "
    "state merges with per-register MAX (associative) so sketches from "
    "partitions/snapshots combine without a rescan",
)
def approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow map to (register, rho), a 64-group MAX agg (map-side
    combine caps every partition's contribution at m rows), then exact
    integer register folding: sum of 2^(B+1-rho) stays < 2^61. Empty
    registers enter the harmonic sum as 2^(B+1) (rho=0), exactly as
    Flajolet et al. define Z. The only float op is the final division
    of the precomputed alpha*m^2*2^(B+1) literal by that sum."""
    events = _t(spark, sf_dir, "events")
    h = phash60(F.col("user_id").cast("string"))
    b = events.select(
        (h % HLL_M).alias("idx"), F.shiftright(h, 6).alias("rest")
    )
    rho = F.when(
        F.col("rest") > 0, F.lit(HLL_B + 1) - F.length(F.bin("rest"))
    ).otherwise(F.lit(HLL_B + 1))
    regs = b.select("idx", rho.alias("rho")).groupBy("idx").agg(
        F.max("rho").alias("rho")
    )
    s = regs.agg(
        F.count("*").alias("regs_used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_B + 1} - rho)")).alias(
            "s_present"
        ),
    )
    e = events.agg(F.countDistinct("user_id").alias("exact_distinct"))
    s_scaled = F.col("s_present") + (F.lit(HLL_M) - F.col("regs_used")) * F.lit(
        1 << (HLL_B + 1)
    )
    return s.crossJoin(F.broadcast(e)).select(
        "exact_distinct",
        "regs_used",
        s_scaled.alias("s_scaled"),
        (F.lit(HLL_NUM) / s_scaled.cast("double")).alias("est_hll"),
    )


@register(
    "text_unigram_surprisal",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    t2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM t2 GROUP BY term),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t_total FROM c),
    s AS (
        SELECT term, CAST(length(bin(t_total // c)) - 1 AS BIGINT) AS surp_bits
        FROM c CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(surp_bits) AS BIGINT) AS sum_bits,
           CAST(SUM(surp_bits) AS DOUBLE) / COUNT(*) AS mean_bits
    FROM t2 JOIN s USING (term)
    GROUP BY doc_id
    """,
    doc="per-document unigram-LM surprisal in whole bits: "
    "floor(log2(T/c)) per token instance (= bit_length(T div c) - 1, "
    "exact integer), summed per doc; mean_bits is the one-division "
    "float. High mean = rare vocabulary — the perplexity-proxy quality "
    "signal, ln-free so both engines agree bit-for-bit",
    survey_ref="training-pipeline ops: LM-based quality scoring "
    "(perplexity-filter surrogate, NOTES round-3 idea); same zipfian "
    "term-join shape as text_tfidf_top_terms",
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One explode, a map-side-combined term agg, a 1-row broadcast
    total, integer-bits surprisal per term (length(bin(T div c)) - 1),
    then the term join back to the token stream and a per-doc agg.
    No global sort, no window; the term dictionary is tiny relative to
    the corpus, so AQE turns the scoring join into a broadcast."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    counts = toks.groupBy("term").agg(F.count("*").alias("c"))
    tot = counts.agg(F.sum("c").alias("t_total"))
    surp = counts.crossJoin(F.broadcast(tot)).select(
        "term",
        (F.length(F.bin(F.expr("t_total div c"))) - 1).cast("long").alias(
            "surp_bits"
        ),
    )
    return (
        toks.join(surp, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("surp_bits").alias("sum_bits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_bits",
            (F.col("sum_bits").cast("double") / F.col("n_tokens")).alias(
                "mean_bits"
            ),
        )
    )
