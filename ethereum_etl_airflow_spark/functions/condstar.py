"""Conditional-aggregation star shapes: TPC-H Q12/Q14/Q19 analogues.

`starjoin.py` covers the join-heavy star shapes (Q3/Q5/Q16/Q4); this
module covers the other half of the reference's enrich/verify SQL
vocabulary — CASE-conditional aggregates and disjunctive (OR-of-ANDs)
predicates over a fact⋈dim join:

* **promo share (Q14 shape)** — a ratio of two conditional sums over
  the SAME join pass: one scan, one broadcast join, one group-agg.
  The reference computes exactly this shape in its verify stage
  (ratio-of-sums freshness/completeness checks,
  verify_streaming/sqls) and its token-transfer enrich views.
* **late lines (Q12 shape)** — a cross-table inequality predicate
  (`l_shipdate > o_orderdate + 60 days`: the predicate needs BOTH
  sides, so it evaluates post-join, never pushes) feeding two
  CASE-conditional counts per group. The physical insistence: the
  orders⋈lineitem exchange pair is the ONLY fact-sized shuffle and
  the conditional counts fold into ONE aggregate pass — never one
  pass per CASE branch.
* **disjunctive bands (Q19 shape)** — OR-of-ANDs across the join
  (brand/size/quantity bands). Catalyst must extract the common
  `p_brand IN (...)` conjunct from the disjunction and push it to
  the dim scan (constraint extraction — free pruning the naive
  per-branch UNION rewrite forfeits), then broadcast the surviving
  dim rows; the fact side stays un-shuffled.

Plus one training-pipeline ratio in the same conditional-agg family:

* **tokenizer fertility** — per-source BPE-ish-tokens-per-word and
  chars-per-token (the standard tokenizer-efficiency diagnostic when
  choosing a vocab for a mixed-source corpus): two token counters in
  one narrow map, one 4-key group-agg. Ratios divide two exact
  integer sums as doubles — deterministic IEEE on both engines.

Float discipline: revenue sums aggregate as DECIMAL(38,6) and ship
as DOUBLE; ratios divide the already-exact aggregates as doubles in
the same association order on both engines (house rule).

Reference parity: conditional-aggregate verify checks
(dags/resources/stages/verify/sqls/*), enrich-stage stacked joins
(enrich/sqls/*); TPC-H shapes are public benchmark definitions
(specification, not code). SURVEY §2.4 A1/A6, §2.3 J2/J3, §2.2 P5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register

_REV_DEC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))"


@register(
    "promo_revenue_share",
    oracle=f"""
    WITH j AS (
        SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
               {_REV_DEC} AS rev,
               CASE WHEN p_type LIKE 'PROMO%' THEN {_REV_DEC}
                    ELSE CAST(0 AS DECIMAL(38,6)) END AS promo_rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT ship_month,
           CAST(SUM(promo_rev) AS DOUBLE) AS promo_revenue,
           CAST(SUM(rev) AS DOUBLE) AS total_revenue,
           100.0 * (CAST(SUM(promo_rev) AS DOUBLE)
                    / CAST(SUM(rev) AS DOUBLE)) AS promo_share_pct
    FROM j GROUP BY ship_month
    """,
    doc="Q14 shape: promo revenue share per ship month — ratio of two "
    "CASE-conditional decimal sums computed in ONE join pass (broadcast "
    "part, single group-agg); share divides the exact aggregates as "
    "doubles in the same association order on both engines",
    survey_ref="verify-stage ratio checks (verify_streaming/sqls), "
    "enrich token views; TPC-H Q14 (public spec); SURVEY §2.4 A6",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: part broadcasts (dim ≪ fact), lineitem never shuffles on
    the join; the ONLY exchange is the month group-agg (≤ ~84 keys).
    Both conditional sums ride one aggregate pass — at 100 TB the
    alternative (two joins or a UNION of branches) doubles fact IO."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    j = li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
    agg = j.groupBy(
        F.date_trunc("month", F.col("l_shipdate"))
        .cast("date")
        .alias("ship_month")
    ).agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )
    return agg.withColumn(
        "promo_share_pct",
        F.lit(100.0)
        * (F.col("promo_revenue") / F.col("total_revenue")),
    )


@register(
    "late_lines_by_priority",
    oracle="""
    SELECT l_returnflag,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                      THEN 1 END) AS low_line_count,
           COUNT(*) AS n_late_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
    doc="Q12 shape: lines shipped >=60 days after their order, "
    "CASE-conditional priority-class counts per return flag — the "
    "cross-table inequality evaluates post-join (needs both sides); "
    "both counts fold into one aggregate pass",
    survey_ref="verify-stage lag checks (verify/sqls freshness); "
    "TPC-H Q12 (public spec); SURVEY §2.4 A1, §2.2 P5",
)
def late_lines_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: ONE fact-sized exchange pair (orders⋈lineitem on the
    orderkey both sides need anyway), lateness filter fused post-join
    in the same codegen stage, then a 3-key conditional agg. Never a
    pass per CASE branch; never a pre-join shuffle of either filter."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") >= F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(late)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
            F.count("*").alias("n_late_lines"),
        )
    )


#: Q19-shape (brand, max size, quantity band) disjunction arms
_BANDS = [
    ("Brand#12", 5, 1.0, 11.0),
    ("Brand#23", 10, 10.0, 20.0),
    ("Brand#4", 15, 20.0, 30.0),
]


@register(
    "brand_band_disjunctive",
    oracle=f"""
    SELECT p_brand,
           CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE {" OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s}"
        f" AND l_quantity BETWEEN {ql} AND {qh})"
        for b, s, ql, qh in _BANDS
    )}
    GROUP BY p_brand
    """,
    doc="Q19 shape: OR-of-ANDs across the join (brand x size x "
    "quantity bands) — Catalyst extracts the common p_brand IN (...) "
    "conjunct from the disjunction and pushes it to the dim scan, the "
    "surviving dim rows broadcast, the fact side never shuffles",
    survey_ref="derived-extract disjunctive selectors (parse-stage "
    "topic filters); TPC-H Q19 (public spec); SURVEY §2.2 P4/P5",
)
def brand_band_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan to insist on: PushedFilters on the part scan contains the
    extracted In(p_brand, [...]) even though the user predicate is a
    disjunction; part broadcasts; exchanges = the 3-key group-agg
    only. The naive UNION-per-arm rewrite scans the fact 3x."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    arm = None
    for b, s, ql, qh in _BANDS:
        c = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(1, s)
            & F.col("l_quantity").between(ql, qh)
        )
        arm = c if arm is None else (arm | c)
    return (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .where(arm)
        .groupBy("p_brand")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


#: BPE-ish pre-tokenizer (GPT-2 spirit): digits runs and punctuation
#: runs split off words. Java-regex∩RE2 subset; replacement backref
#: spelled $1 (Spark) / \1 (DuckDB) for the same pattern.
_PRETOK_RE = r"(\d+|[^\w\s]+)"


@register(
    "tokenizer_fertility_stats",
    oracle=f"""
    WITH t AS (
        SELECT source, n_chars,
               len(list_filter(
                   string_split_regex(
                       regexp_replace(text, '{_PRETOK_RE}', ' \\1 ', 'g'),
                       '\\s+'),
                   x -> x <> '')) AS n_bpe,
               len(string_split(text, ' ')) AS n_w
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_w) AS BIGINT) AS total_words,
           CAST(SUM(n_bpe) AS DOUBLE)
               / CAST(SUM(n_w) AS DOUBLE) AS fertility,
           CAST(SUM(n_chars) AS DOUBLE)
               / CAST(SUM(n_bpe) AS DOUBLE) AS chars_per_token
    FROM t GROUP BY source
    """,
    doc="tokenizer-efficiency diagnostic per source: BPE-ish tokens "
    "per whitespace word (fertility) and chars per token — two token "
    "counters in one narrow map, one bounded group-agg; ratios divide "
    "exact integer sums as doubles",
    survey_ref="training-pipeline ops (task brief): token counting "
    "family sibling of text_token_stats (per-doc) — this is the "
    "per-SOURCE vocab-selection view; pre-tokenizer shared with "
    "functions/text.py bpe_ish_tokens",
)
def tokenizer_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: one documents scan reading (source, text, n_chars), both
    counters computed in the same codegen stage (no second scan, no
    Python), one exchange for the ≤|sources| group-agg with map-side
    combine — at 100 TB the wire carries |sources| partial rows per
    task."""
    from ethereum_etl_airflow_spark.functions.text import (
        bpe_ish_tokens,
        tokens_col,
    )

    d = _t(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        "n_chars",
        F.size(bpe_ish_tokens()).alias("n_bpe"),
        F.size(tokens_col()).alias("n_w"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.sum("n_w").alias("total_words"),
        F.sum("n_chars").alias("sum_chars"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_bpe_tokens",
        "total_words",
        (
            F.col("total_bpe_tokens").cast("double")
            / F.col("total_words").cast("double")
        ).alias("fertility"),
        (
            F.col("sum_chars").cast("double")
            / F.col("total_bpe_tokens").cast("double")
        ).alias("chars_per_token"),
    )
