"""Gopher-style document quality gates, reported as a per-source
rule-failure census.

The Gopher corpus work (Rae et al. 2021, arXiv:2112.11446, table A1)
filters web documents by hard rules — word count in [50, 100k], mean
word length in [3, 10], stopword evidence, duplicate-content
fraction — and reports how many documents each rule removes per
source. ``text_quality_score`` covers the per-document C4-style
score; this operator covers the OTHER shape a corpus pipeline needs:
the per-source census of which rule fires (the "filter funnel" that
decides whether a source is worth crawling).

Every rule is evaluated in exact integer arithmetic — ratio rules are
cross-multiplied (``3·n ≤ Σlen ≤ 10·n`` instead of ``3 ≤ Σlen/n ≤
10``) so both engines agree without any float comparison. Rules that
need punctuation/symbol structure the synthetic corpus lacks
(symbol-to-word ratio, bullet lines) are deliberately not faked; the
four rules below are the subset the corpus can exercise honestly.

Scale notes (100 TB): one narrow JVM map computes all per-doc rule
booleans from array combinators (no explode — the token list never
leaves the row), then ONE tiny aggregate (|sources| groups) with
map-side partial combine. Zero joins, one exchange carrying a few
counter columns per source.

Reference parity: the reference's verify stage is exactly this shape
— per-table rule censuses as conditional aggregates
(dags/resources/stages/verify/sqls/*). SURVEY §2.4 A1/A7,
training-pipeline quality-filter family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register

#: the corpus-wide stopword evidence list (shared with text_langid /
#: text_quality_score so the gates compose)
_STOPWORDS = ("the", "a", "of", "and", "to")


@register(
    "quality_gopher_census",
    oracle="""
    WITH t AS (
        SELECT source, string_split(text, ' ') AS toks FROM documents
    ), f AS (
        SELECT source,
               CAST(len(toks) AS BIGINT) AS n_tok,
               CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT)
                   AS sum_len,
               CAST(len(list_filter(toks,
                    x -> list_contains(['the','a','of','and','to'], x)))
                    AS BIGINT) AS n_stop,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq
        FROM t
    ), r AS (
        SELECT source,
               CASE WHEN n_tok < 50 OR n_tok > 100000 THEN 1 ELSE 0 END
                   AS f_wordcount,
               CASE WHEN 3 * n_tok > sum_len OR sum_len > 10 * n_tok
                    THEN 1 ELSE 0 END AS f_wordlen,
               CASE WHEN n_stop < 2 THEN 1 ELSE 0 END AS f_stopword,
               CASE WHEN 5 * n_uniq <= n_tok THEN 1 ELSE 0 END AS f_dupfrac
        FROM f
    )
    SELECT source,
           COUNT(*) AS n_docs,
           SUM(CASE WHEN f_wordcount + f_wordlen + f_stopword + f_dupfrac = 0
                    THEN 1 ELSE 0 END)::BIGINT AS n_pass,
           SUM(f_wordcount)::BIGINT AS fail_wordcount,
           SUM(f_wordlen)::BIGINT AS fail_wordlen,
           SUM(f_stopword)::BIGINT AS fail_stopword,
           SUM(f_dupfrac)::BIGINT AS fail_dupfrac
    FROM r GROUP BY source
    """,
    doc="Gopher rule census per source: word-count bounds, "
    "cross-multiplied mean-word-length bounds, stopword evidence, "
    "unique-token fraction — per-source document counts, pass counts, "
    "and per-rule failure counts, all exact integers",
    survey_ref="Gopher filters (arXiv:2112.11446 A1, public method); "
    "reference verify-stage rule censuses (verify/sqls/*); SURVEY "
    "§2.4 A1/A7",
)
def quality_gopher_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All per-doc booleans from array combinators in one narrow JVM
    map (no explode), then one |sources|-group aggregate."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_tok = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long")
    )
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x))).cast(
        "long"
    )
    n_uniq = F.size(F.array_distinct(toks)).cast("long")

    f_wordcount = F.when((n_tok < 50) | (n_tok > 100_000), 1).otherwise(0)
    f_wordlen = F.when(
        (3 * n_tok > sum_len) | (sum_len > 10 * n_tok), 1
    ).otherwise(0)
    f_stopword = F.when(n_stop < 2, 1).otherwise(0)
    f_dupfrac = F.when(5 * n_uniq <= n_tok, 1).otherwise(0)

    r = d.select(
        "source",
        f_wordcount.alias("f_wordcount"),
        f_wordlen.alias("f_wordlen"),
        f_stopword.alias("f_stopword"),
        f_dupfrac.alias("f_dupfrac"),
    )
    all_pass = (
        F.col("f_wordcount")
        + F.col("f_wordlen")
        + F.col("f_stopword")
        + F.col("f_dupfrac")
        == 0
    )
    return r.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(all_pass, 1).otherwise(0)).alias("n_pass"),
        F.sum("f_wordcount").alias("fail_wordcount"),
        F.sum("f_wordlen").alias("fail_wordlen"),
        F.sum("f_stopword").alias("fail_stopword"),
        F.sum("f_dupfrac").alias("fail_dupfrac"),
    )
