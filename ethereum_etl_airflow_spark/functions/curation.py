"""Corpus-curation audits: embedding-norm outliers, exact KS drift.

Two data-quality gates a training pipeline runs before a corpus or an
embedding table is admitted:

* **norm outliers** — embeddings with a degenerate L2 norm (all-zero
  truncations, exploding values from a bad encoder shard) poison both
  cosine dedup and ANN recall. Flag |z| > 3 on the squared-norm
  series using the cross-multiplied EXACT integer inequality
  ``(n*x - s)^2 > 9*(n*q - s^2)`` — the events_anomaly_zscore
  discipline applied to the embedding table, so no float mean or
  variance exists to drift between engines. Second moments of the
  squared norms reach ~1e32, past int64 — they accumulate as
  DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both exact; headroom to
  ~1e38 covers ~1e9 vectors at this dim/scale, beyond which the norms
  would be pre-scaled down.
* **KS drift** — the exact two-sample Kolmogorov-Smirnov distance of
  each source's document-length distribution against the whole
  corpus: ``KS_s = max_v |ECDF_s(v) - ECDF(v)|``. The max runs over
  the cross-multiplied integer numerator ``|cs*N - C*n_s|`` (exact),
  and only the final reported statistic divides the exact winners as
  doubles. A source whose length profile drifts from the corpus is
  the first sign of a scraper regression — this is the distributional
  sibling of vocab_drift_splits (token-rate drift).

Spark-first shapes: the only corpus-sized stage in either query is
the first aggregate; everything after runs on bounded grids
(#vectors' moment triple is 1 row; the KS grid is |sources| x
|distinct lengths|). The global ECDF is attached per grid row (gc
repeats identically in every source partition), so the global cumsum
computes INSIDE the per-source window — no single-partition window
anywhere.

Reference parity: verify-stage distribution checks
(dags/resources/stages/verify/sqls/*) generalized per SURVEY §2.4
A3/A6; curation ops are the task brief's training-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.veclib import (
    _IVEC_SQL,
    _NORM_SQL,
    _norm_sq,
    int_vec,
)
from ethereum_etl_airflow_spark.queries import _t, register


@register(
    "embedding_norm_outliers",
    oracle=f"""
    WITH nm AS (
        SELECT vec_id, label, {_NORM_SQL} AS norm2
        FROM (SELECT vec_id, label, {_IVEC_SQL} AS iv FROM embeddings)
    ), st AS (
        SELECT COUNT(*)::HUGEINT AS n,
               SUM(norm2)::HUGEINT AS s,
               SUM(CAST(norm2 AS HUGEINT) * CAST(norm2 AS HUGEINT)) AS q
        FROM nm
    )
    SELECT vec_id, label, norm2,
           ((n * norm2 - s) * (n * norm2 - s)
              > 9 * (n * q - s * s)) AS is_outlier
    FROM nm CROSS JOIN st
    """,
    doc="degenerate-embedding gate: |z| > 3 on the exact integer "
    "squared-norm series, evaluated as the cross-multiplied inequality "
    "(n*x - s)^2 > 9*(n*q - s^2) with DECIMAL(38,0)/HUGEINT second "
    "moments — no float statistics exist to drift between engines",
    survey_ref="training-pipeline curation family (task brief); "
    "z-test discipline shared with events_anomaly_zscore "
    "(functions/timeseries.py); norm kernel functions/veclib.py",
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: ONE embeddings scan -> norm fold (narrow JVM codegen) ->
    1-row moment triple (map-side combined) broadcast back onto the
    rows. At 10^9 vectors the only vector-sized stages are the fold
    and the final flag projection — the z-test itself is row-local."""
    emb = _t(spark, sf_dir, "embeddings")
    d38 = "decimal(38,0)"
    # norms referenced twice (moments + flag projection); checkpoint
    # scans the table once (the events_anomaly_zscore discipline)
    nm = emb.select(
        "vec_id", "label", _norm_sq(int_vec()).alias("norm2")
    ).localCheckpoint()
    st = nm.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("norm2").cast(d38).alias("s"),
        F.sum(
            F.col("norm2").cast(d38) * F.col("norm2").cast(d38)
        ).alias("q"),
    )
    dev = F.col("n") * F.col("norm2").cast(d38) - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return nm.crossJoin(F.broadcast(st)).select(
        "vec_id",
        "label",
        "norm2",
        (dev * dev > 9 * var_n2).alias("is_outlier"),
    )


@register(
    "quality_ks_drift",
    oracle="""
    WITH lens AS (
        SELECT source, len(string_split(text, ' ')) AS v FROM documents
    ), cnt AS (
        SELECT source, v, COUNT(*)::BIGINT AS c FROM lens GROUP BY 1, 2
    ), gtot AS (
        SELECT v, SUM(c)::BIGINT AS gc FROM cnt GROUP BY 1
    ), srcs AS (
        SELECT source, SUM(c)::BIGINT AS n_s FROM cnt GROUP BY 1
    ), tot AS (
        SELECT SUM(gc)::BIGINT AS n_all FROM gtot
    ), dense AS (
        SELECT s.source, g.v, COALESCE(c.c, 0) AS c, s.n_s, g.gc
        FROM srcs s CROSS JOIN gtot g
        LEFT JOIN cnt c ON c.source = s.source AND c.v = g.v
    ), ecdf AS (
        SELECT source, n_s,
               SUM(c)  OVER (PARTITION BY source ORDER BY v) AS cs,
               SUM(gc) OVER (PARTITION BY source ORDER BY v) AS cg
        FROM dense
    )
    SELECT source,
           n_s AS n_docs,
           CAST(MAX(ABS(cs * n_all - cg * n_s)) AS BIGINT) AS ks_num,
           CAST(MAX(ABS(cs * n_all - cg * n_s)) AS DOUBLE)
               / CAST(n_s * n_all AS DOUBLE) AS ks_stat
    FROM ecdf CROSS JOIN tot
    GROUP BY source, n_s, n_all
    """,
    doc="exact two-sample KS distance of each source's doc-length "
    "distribution vs the whole corpus: the max runs over the "
    "cross-multiplied integer numerator |cs*N - C*n_s|; only the "
    "final statistic divides the exact winners as doubles",
    survey_ref="verify-stage distribution checks (verify/sqls) "
    "generalized; drift sibling of vocab_drift_splits "
    "(functions/corpus.py); SURVEY §2.4 A3/A6",
)
def quality_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: corpus scanned ONCE into (source, v) counts (the only
    corpus-sized stage, map-side combined); the densified ECDF grid is
    |sources| x |distinct v| rows with the global cumsum attached per
    row, so both ECDFs compute inside the same per-source window — no
    single-partition window, no second corpus pass."""
    d = _t(spark, sf_dir, "documents")
    cnt = (
        d.select("source", F.size(F.split("text", " ")).alias("v"))
        .groupBy("source", "v")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    gtot = cnt.groupBy("v").agg(F.sum("c").alias("gc"))
    srcs = cnt.groupBy("source").agg(F.sum("c").alias("n_s"))
    tot = gtot.agg(F.sum("gc").alias("n_all"))
    dense = (
        srcs.crossJoin(gtot)
        .join(cnt, ["source", "v"], "left")
        .select(
            "source",
            "v",
            F.coalesce("c", F.lit(0)).alias("c"),
            "n_s",
            "gc",
        )
    )
    w = W.partitionBy("source").orderBy("v")
    ecdf = dense.select(
        "source",
        "n_s",
        F.sum("c").over(w).alias("cs"),
        F.sum("gc").over(w).alias("cg"),
    )
    num = F.abs(
        F.col("cs") * F.col("n_all") - F.col("cg") * F.col("n_s")
    )
    return (
        ecdf.crossJoin(F.broadcast(tot))
        .groupBy("source", "n_s", "n_all")
        .agg(F.max(num).alias("ks_num_raw"))
        .select(
            "source",
            F.col("n_s").alias("n_docs"),
            F.col("ks_num_raw").cast("long").alias("ks_num"),
            (
                F.col("ks_num_raw").cast("double")
                / (F.col("n_s") * F.col("n_all")).cast("double")
            ).alias("ks_stat"),
        )
    )
