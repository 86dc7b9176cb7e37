"""Prefix-filter losslessness: the Jaccard near-dup result must be
IDENTICAL under both global shingle orders (lexicographic and
ascending-df PPJoin order) — the order only shapes candidate
generation, never recall."""

from __future__ import annotations

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.functions.dedup import (
    JACCARD_THRESHOLD,
    _jaccard_candidates,
    shingles_col,
)

SF = "/root/testdata/sf0.01"


def _pairs(spark, order):
    d = spark.read.parquet(f"{SF}/documents.parquet").where(
        F.size(F.split("text", " ")) >= 3
    )
    sh = d.select("doc_id", shingles_col(F.split("text", " ")).alias("sh"))
    cand = _jaccard_candidates(sh, order)
    a, b = sh.alias("sa"), sh.alias("sb")
    n_common = F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
    n_union = F.size(F.col("sa.sh")) + F.size(F.col("sb.sh")) - n_common
    out = (
        cand.join(a, F.col("sa.doc_id") == F.col("doc_a"))
        .join(b, F.col("sb.doc_id") == F.col("doc_b"))
        .where(n_common.cast("double") / n_union >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    return {(r["doc_a"], r["doc_b"]) for r in out.collect()}


def test_df_order_equals_lex_order(spark):
    lex = _pairs(spark, "lex")
    dfo = _pairs(spark, "df")
    assert lex == dfo and len(lex) > 0


def test_df_order_prefixes_are_rarest_first(spark):
    """The df-order prefix must consist of each doc's LOWEST-df
    shingles (the PPJoin property the candidate collapse relies on)."""
    d = spark.read.parquet(f"{SF}/documents.parquet").where(
        F.size(F.split("text", " ")) >= 3
    )
    sh = d.select("doc_id", shingles_col(F.split("text", " ")).alias("sh"))
    ex = sh.select("doc_id", F.explode("sh").alias("g"))
    df_tbl = ex.groupBy("g").agg(F.count("*").alias("df"))
    # max df inside each doc's df-order prefix <= min df outside it
    ranked = (
        ex.join(df_tbl, "g")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "g"))).alias("rk"))
    )
    plen = (
        F.size("rk") - F.floor(F.lit(JACCARD_THRESHOLD) * F.size("rk")) + 1
    ).cast("int")
    checked = ranked.select(
        F.size("rk").alias("n"),
        plen.alias("p"),
        F.element_at(F.col("rk"), plen)["df"].alias("max_in_prefix"),
        F.when(
            plen < F.size("rk"), F.element_at(F.col("rk"), plen + 1)["df"]
        ).alias("min_after"),
    )
    bad = checked.where(
        F.col("min_after").isNotNull() & (F.col("max_in_prefix") > F.col("min_after"))
    ).count()
    assert bad == 0
