"""Exact distributed order statistics: per-group quantiles by
deterministic bucket selection.

``percentile_approx`` trades accuracy for one pass; the EXACT path in
most engines is a per-group sort — which in Spark's window form
(``row_number over (partition by g order by v)``) funnels each group
through ONE task: a 10^9-row group is a straggler.  This operator
computes exact discrete quantiles with no global or per-group
single-task sort:

1. per-group ``[min, max]`` — one map-side-combined aggregate
   (#groups rows collected);
2. every row gets a DETERMINISTIC bucket id
   ``width_bucket(v, mn, mx, B)`` from the broadcast bounds — a pure
   function of the value, so every pass over the source assigns the
   same bucket (unlike ``repartitionByRange``, whose sampled
   boundaries can differ between the counting job and the picking
   job — a silent-corruption hazard this design exists to avoid);
3. per-(group, bucket) counts — a tiny aggregate (≤ #groups × B
   rows) collected to the driver, prefix-summed in bucket order to
   locate which bucket holds each target rank ``ceil(p * n)`` and at
   what local offset (the same bounded two-phase-scan discipline as
   ``corpus.global_prefix_sum``);
4. a second pass SEMI-JOINS down to only the target buckets
   (≈ #groups × #quantiles buckets, each ~n/B rows) and sorts each
   one locally in a cogrouped Arrow task — the only sorts in the
   whole plan are these n/B-bounded ones.

Discrete ("lower") quantile semantics: the value at 1-indexed rank
``ceil(p*n)`` — deterministic under duplicate values (any tie-break
yields the same value), and expressible identically in ANSI SQL for
the oracle.

Scale note: the driver holds #groups × B counters; B trades bucket
balance against driver memory.  The operator targets FEW, HUGE groups
(the case window functions can't handle) — for millions of tiny
groups the plain window form is already parallel enough.

Reference parity: generalizes the reference's scalar aggregate checks
(e.g. AVG tolerance bands, `build_verify_streaming_dag.py`) to exact
order statistics, which BigQuery offers as APPROX_QUANTILES only.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register

#: quantiles computed by the registered query
QUANTILES = (0.25, 0.50, 0.90, 0.99)


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...],
    num_buckets: int | None = None,
) -> DataFrame:
    """(group, q, value) — exact discrete quantiles per group."""
    spark = df.sparkSession
    data = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    )
    g_type = data.schema["g"].dataType.simpleString()
    v_type = data.schema["v"].dataType.simpleString()
    out_schema = f"g {g_type}, q double, value {v_type}"
    nbuckets = int(
        num_buckets or spark.conf.get("spark.sql.shuffle.partitions")
    )

    # pass 0: per-group value range (map-side combine; #groups rows)
    bounds = data.groupBy("g").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    ).collect()
    if not bounds:
        return spark.createDataFrame([], out_schema).select(
            F.col("g").alias(group_col), "q", "value"
        )
    bounds_df = spark.createDataFrame(
        [(r["g"], r["mn"], r["mx"]) for r in bounds],
        schema=f"g {g_type}, mn {v_type}, mx {v_type}",
    )
    # deterministic bucket id: pure function of (v, collected bounds) —
    # identical on every pass over the source
    bucketed = (
        data.join(F.broadcast(bounds_df), "g")
        .withColumn(
            "b",
            F.when(F.col("mx") == F.col("mn"), F.lit(1).cast("bigint"))
            .otherwise(
                F.least(
                    F.lit(nbuckets).cast("bigint"),
                    F.width_bucket("v", "mn", "mx", F.lit(nbuckets)),
                )
            ),
        )
        .select("g", "v", "b")
    )

    # pass 1: per-(group, bucket) counts -> locate target ranks
    counts = bucketed.groupBy("g", "b").count().collect()
    totals: dict = defaultdict(int)
    for r in counts:
        totals[r["g"]] += r["count"]
    # rank -> [q...]: two quantiles may land on the SAME rank for a
    # small group; each must emit its own row (as the SQL oracle does)
    targets: dict = {}
    for g, n in totals.items():
        ranks: dict = defaultdict(list)
        for q in quantiles:
            ranks[max(1, int(math.ceil(q * n)))].append(q)
        targets[g] = ranks
    picks: dict = defaultdict(list)  # (g, b) -> [(local_rank, q)]
    seen: dict = defaultdict(int)
    for r in sorted(counts, key=lambda r: (r["g"], r["b"])):
        g, b, c = r["g"], r["b"], r["count"]
        s = seen[g]  # rows of g in buckets before b
        for rank, qs in targets[g].items():
            if s < rank <= s + c:
                picks[(g, b)].extend((rank - s, q) for q in qs)
        seen[g] = s + c

    # pass 2: semi-join down to target buckets, sort each locally
    keys_df = spark.createDataFrame(
        list(picks), schema=f"g {g_type}, b bigint"
    )
    target_rows = bucketed.join(F.broadcast(keys_df), ["g", "b"], "left_semi")
    b_picks = spark.sparkContext.broadcast(dict(picks))

    def pick(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        want = b_picks.value.get((key[0], key[1]), [])
        if not want:
            return pd.DataFrame({"g": [], "q": [], "value": []})
        vs = np.sort(pdf["v"].to_numpy(), kind="stable")
        return pd.DataFrame(
            {
                "g": [key[0]] * len(want),
                "q": [q for _, q in want],
                "value": [vs[rank - 1] for rank, _ in want],
            }
        )

    return (
        bucketed.sparkSession.createDataFrame([], out_schema)
        if not picks
        else target_rows.groupBy("g", "b")
        .applyInPandas(pick, schema=out_schema)
        .select(F.col("g").alias(group_col), "q", "value")
    )


@register(
    "events_exact_quantiles",
    oracle=f"""
    WITH r AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_type, q, value
    FROM r
    CROSS JOIN (SELECT CAST(unnest([{", ".join(str(q) for q in QUANTILES)}])
                        AS DOUBLE) AS q) qs
    WHERE rn = GREATEST(CAST(CEIL(q * n) AS BIGINT), 1)
    """,
    doc="exact per-type value quantiles (p25/p50/p90/p99) via "
    "deterministic bucket selection — no global or per-group "
    "single-task sort",
    survey_ref="§2 A6 tolerance bands generalized to exact order "
    "statistics; percentile_approx's exact, still-distributed sibling",
)
def events_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return exact_group_quantiles(ev, "event_type", "value", QUANTILES)


@register(
    "key_skew_profile",
    oracle="""
    WITH c AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ), t AS (
        SELECT COUNT(*) AS n_keys, SUM(cnt) AS total, MAX(cnt) AS max_cnt
        FROM c
    ), ranked AS (
        SELECT user_id, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id ASC) AS rnk
        FROM c
    )
    SELECT r.rnk, r.user_id, r.cnt,
           r.cnt::DOUBLE / t.total AS share,
           t.total::DOUBLE / t.n_keys AS mean_cnt,
           t.max_cnt::DOUBLE / (t.total::DOUBLE / t.n_keys) AS skew_ratio
    FROM ranked r CROSS JOIN t WHERE r.rnk <= 10
    """,
    doc="top-10 heavy-hitter keys with share-of-total and max/mean "
    "skew ratio — the pre-join diagnostic that decides whether a key "
    "needs salting",
    survey_ref="SURVEY §4 skew handling, operationalized: the engine's "
    "salting/AQE decisions start from this profile",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One map-side-combined count per key, a 1-row broadcast total,
    and a distributed top-10 via orderBy+limit (TakeOrdered — per-
    partition heaps, never a global sort or single-partition window
    over the full key domain); ranks are then assigned by a window
    over only the surviving 10 rows. All shares divide exact ints ->
    IEEE doubles, identical in both engines."""
    from pyspark.sql import Window as W

    c = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
    )
    t = c.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
    )
    top = c.orderBy(F.desc("cnt"), F.asc("user_id")).limit(10)
    w = W.orderBy(F.desc("cnt"), F.asc("user_id"))
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .crossJoin(F.broadcast(t))
        .select(
            "rnk",
            "user_id",
            "cnt",
            (F.col("cnt").cast("double") / F.col("total")).alias("share"),
            (F.col("total").cast("double") / F.col("n_keys")).alias("mean_cnt"),
            (
                F.col("max_cnt").cast("double")
                / (F.col("total").cast("double") / F.col("n_keys"))
            ).alias("skew_ratio"),
        )
    )


# --------------------------------------------------------------------------
# Mergeable log2-histogram quantile sketch
# --------------------------------------------------------------------------

#: quantiles estimated by the sketch query
SKETCH_QUANTILES = (0.5, 0.95, 0.99)


@register(
    "sketch_histogram_quantiles",
    oracle="""
    WITH h AS (
        SELECT CAST(length(bin(CAST(floor(value * 1000) AS BIGINT)))
                    AS INT) AS bucket_bits,
               count(*) AS n
        FROM events WHERE value IS NOT NULL
        GROUP BY 1
    ),
    c AS (
        SELECT bucket_bits,
               sum(n) OVER (ORDER BY bucket_bits) AS cum,
               sum(n) OVER () AS total
        FROM h
    ),
    qs(q) AS (SELECT CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE))
    SELECT qs.q,
           CAST(min(c.bucket_bits) AS INT) AS bucket_bits,
           CAST(power(2.0, min(c.bucket_bits)) / 1000 AS DOUBLE) AS est_upper
    FROM qs JOIN c ON c.cum >= CAST(ceil(qs.q * c.total) AS BIGINT)
    GROUP BY qs.q
    """,
    doc="mergeable log2-histogram quantile sketch: <=64 fixed buckets "
    "(integer bit-length of milli-value), one map-side-combined agg, "
    "quantile = first bucket reaching rank ceil(q*n); factor-2 error "
    "bound by construction",
    survey_ref="one-pass mergeable alternative to events_exact_quantiles "
    "(BigQuery APPROX_QUANTILES parity) — the per-batch streaming "
    "telemetry shape: histograms merge across batches by cell-wise add",
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One histogram aggregation (<=64 cells, map-side combine does the
    real work), then cumsum + rank-pick over the TINY histogram — the
    windows run on <=64 rows, never on data. The bucket function
    (bit length of the integer milli-value) is ln-free and portable
    bit-for-bit, so the oracle reproduces the sketch exactly."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hist = (
        ev.select(
            F.length(F.bin(F.floor(F.col("value") * 1000).cast("long")))
            .cast("int")
            .alias("bucket_bits")
        )
        .groupBy("bucket_bits")
        .agg(F.count("*").alias("n"))
    )
    # single-partition windows over the <=64-row histogram (bounded by
    # construction — the "No Partition Defined" case is the design)
    cum = hist.select(
        "bucket_bits",
        F.sum("n").over(W.orderBy("bucket_bits")).alias("cum"),
        F.sum("n").over(W.orderBy(F.lit(1)).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )).alias("total"),
    )
    qs = spark.createDataFrame([(q,) for q in SKETCH_QUANTILES], "q double")
    return (
        qs.crossJoin(cum)
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("total")).cast("long"))
        .groupBy("q")
        .agg(F.min("bucket_bits").cast("int").alias("bucket_bits"))
        .select(
            "q",
            "bucket_bits",
            (F.pow(F.lit(2.0), F.col("bucket_bits")) / 1000)
            .cast("double")
            .alias("est_upper"),
        )
    )
