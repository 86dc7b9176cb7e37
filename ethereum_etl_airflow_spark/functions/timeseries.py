"""Time-series gap-fill + last-observation-carried-forward (LOCF).

The hypertable/rollup verb the task brief calls out: telemetry rolled
into fixed time buckets must surface EMPTY buckets too (a freshness
dashboard that silently skips gap hours hides exactly the incident it
exists to catch), and per-bucket values must carry forward across the
gaps (LOCF) so downstream joins see the last known state, not NULL.

Spark-first shape:

* bucketize: ``date_trunc`` — a narrow map;
* one aggregate per (series, bucket) — map-side combined; the
  bucket's closing value is ``max_by(value, event_id)`` (an arg-max,
  same shape as the CDC LWW fold) so no arithmetic touches the
  carried double — it is an exact input value in both engines;
* the dense grid is GENERATED per series from its own (min, max)
  bucket — ``sequence`` + ``explode`` (no driver loop, no cross
  join against a global calendar table);
* LOCF is ``last(value, ignorenulls=True)`` over the per-series
  ordered window — one shuffle on the series key.

Scale notes: the window partitions by series — fine when series
cardinality is large (per-device/per-user telemetry). For the
FEW-hot-series case shown here (5 event types), the production form
chunks the window by (series, day) and seeds each chunk with the
previous day's closing value via a 1-row-per-chunk join (two passes,
both parallel) — same results, no single-reducer series. The
single-window form is kept here because the oracle must reproduce it
row-for-row and the chunked rewrite is value-identical by
construction.

Reference parity: the reference's enrich stage publishes per-day
rollup views (stacked SELECT date_trunc GROUP BY) but has no gap-fill
— BigQuery needs a calendar table + LAST_VALUE IGNORE NULLS, which is
precisely what this operator distributes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register


def gapfill_locf(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    bucket: str = "hour",
) -> DataFrame:
    """Dense per-series time grid with LOCF-filled closing values."""
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    observed = events.groupBy(F.col(series_col).alias("series"), b).agg(
        F.count("*").alias("n_events"),
        F.expr(f"max_by({value_col}, {order_col})").alias("close_value"),
    )
    grid = (
        observed.groupBy("series")
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            "series",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval 1 {bucket}"))
            ).alias("bucket_ts"),
        )
    )
    joined = grid.join(observed, ["series", "bucket_ts"], "left")
    w = (
        Window.partitionBy("series")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "series",
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("close_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("n_events").isNull().alias("is_gap"),
    )


@register(
    "events_gapfill_locf",
    oracle="""
    WITH observed AS (
        SELECT event_type AS series,
               date_trunc('hour', ts) AS bucket_ts,
               COUNT(*)::BIGINT AS n_events,
               arg_max(value, event_id) AS close_value
        FROM events
        GROUP BY 1, 2
    ), bounds AS (
        SELECT series, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi
        FROM observed GROUP BY series
    ), grid AS (
        SELECT series,
               unnest(range(lo, hi + INTERVAL 1 HOUR, INTERVAL 1 HOUR))
                   AS bucket_ts
        FROM bounds
    )
    SELECT g.series,
           g.bucket_ts,
           COALESCE(o.n_events, 0)::BIGINT AS n_events,
           last_value(o.close_value IGNORE NULLS) OVER (
               PARTITION BY g.series ORDER BY g.bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           o.n_events IS NULL AS is_gap
    FROM grid g
    LEFT JOIN observed o USING (series, bucket_ts)
    """,
    doc="hypertable rollup with gap-fill + LOCF: hourly buckets per "
    "series densified from each series' own span (sequence+explode), "
    "closing value = arg-max by event order carried forward across "
    "gaps by an ignore-nulls window — no calendar table, no arithmetic "
    "on the carried double",
    survey_ref="training-pipeline/telemetry ops (hypertable rollup per "
    "task brief); ref enrich per-day rollup views (stacked date_trunc "
    "GROUP BY) which lack the gap-fill leg",
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gapfill_locf(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Exact truncated EWMA — the float-free exponential smoother.
#
# EWMA is the standard smoother for metric streams (the per-batch
# throughput/lateness series the CDC sink emits), but the textbook
# recursion s_t = a*v_t + (1-a)*s_{t-1} is an unbounded float fold —
# not replayable bit-for-bit, not window-expressible. Two exactness
# moves make it both:
#
# * alpha = 1/2 and TRUNCATION at the last _EW_N events: the dropped
#   tail weighs 2^-_EW_N < 2e-5 — below the 1e-6 value quantum.
# * integer horner fold: over the frame NEWEST-first,
#   acc' = 2*acc + iv  accumulates  sum(iv_k * 2^(m-k)) exactly in
#   int64 (iv <= 1e9, m <= 16 -> < 2^53); the single final division
#   by 2^m * 1e6 is one IEEE op, bit-identical in both engines.
#   DuckDB's list_reduce seeds with the first element — identical to
#   a 0-seeded fold for this formula (2*0 + x1 = x1).
#
# One exchange on user_id; the frame list is <= _EW_N values, so
# state per row is bounded regardless of history length.
# ---------------------------------------------------------------------------

#: trailing window for the truncated EWMA (tail weight 2^-16 ~ 1.5e-5)
_EW_N = 16


@register(
    "events_ewma_exact",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, event_id,
               CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS iv
        FROM events
    ), framed AS (
        SELECT user_id, event_id,
               list(iv) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN {_EW_N - 1} PRECEDING AND CURRENT ROW
               ) AS frame
        FROM iv
    )
    SELECT user_id, event_id,
           len(frame)::BIGINT AS n_window,
           list_reduce(list_reverse(frame), (acc, x) -> 2 * acc + x)::DOUBLE
               / ((1::BIGINT << len(frame)) * 1000000)::DOUBLE AS ewma
    FROM framed
    """,
    doc="exact truncated EWMA (alpha=1/2, 16-event horizon): integer "
    "Horner fold over the trailing frame — newest event weighs 1/2, "
    "k-th previous 2^-(k+1); one exchange, bounded per-row state, "
    "bit-replayable (no float recursion)",
    survey_ref="CDC per-batch metric smoothing (streaming/tailer "
    "lineage metrics); time-series sibling of events_gapfill_locf",
)
def events_ewma_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list over a ROWS frame keeps frame order (window sort
    order); the fold and the single divide run in codegen. The window
    and any downstream per-key agg share the user_id exchange."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        (F.col("value").cast("decimal(38,6)") * 1000000)
        .cast("long")
        .alias("iv"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-(_EW_N - 1), 0)
    )
    framed = iv.select(
        "user_id",
        "event_id",
        F.collect_list("iv").over(w).alias("frame"),
    )
    num = F.aggregate(
        F.reverse("frame"),
        F.lit(0).cast("long"),
        lambda acc, x: F.lit(2) * acc + x,
    )
    return framed.select(
        "user_id",
        "event_id",
        F.size("frame").cast("long").alias("n_window"),
        (
            num.cast("double")
            / (
                F.expr("shiftleft(CAST(1 AS BIGINT), size(frame))") * 1000000
            ).cast("double")
        ).alias("ewma"),
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS d,
               COUNT(*)::BIGINT AS c
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT event_type,
               COUNT(*)::BIGINT AS n,
               SUM(c)::BIGINT AS s,
               SUM(c * c)::BIGINT AS q
        FROM daily GROUP BY 1
    )
    SELECT d.event_type, d.d, d.c,
           ((st.n * d.c - st.s) * (st.n * d.c - st.s)
              > 9 * (st.n * st.q - st.s * st.s)) AS is_anomaly
    FROM daily d JOIN stats st ON d.event_type = st.event_type
    """,
    doc="volume-anomaly flags on the daily event-count series: a day "
    "is anomalous iff |z| > 3 against its own series' mean/stddev — "
    "evaluated as the cross-multiplied EXACT integer inequality "
    "(n*c - s)^2 > 9*(n*q - s^2), so no float mean/variance ever "
    "exists to drift between engines (the vocab_drift_splits "
    "discipline applied to second moments)",
    survey_ref="feed-health monitoring the reference polls by hand "
    "(*_have_latest.sql sensors generalize to a z-test per series); "
    "lineage-metrics consumer — SURVEY §2.10 completeness family",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two map-side-combined aggregates (day grain, then series grain
    — the second input is #days rows) and a broadcast join of the
    per-series moment triple (n, s, q) back onto the daily rows. At
    10^10 events the only corpus-sized stage is the first agg; the
    z-test itself touches #series*#days rows."""
    ev = _t(spark, sf_dir, "events")
    # daily is referenced twice (moments + the join back); checkpoint
    # makes it a plan leaf so the corpus is scanned ONCE (the
    # graph_triangle_count discipline — on a cluster, checkpoint dir)
    daily = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("d"),
        )
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    dev = F.col("n") * F.col("c") - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "d",
        "c",
        (dev * dev > 9 * var_n2).alias("is_anomaly"),
    )


@register(
    "events_hopping_window",
    oracle="""
    WITH w AS (
        SELECT event_type,
               CAST(value AS DECIMAL(38,6)) AS v,
               time_bucket(INTERVAL 5 MINUTE, ts) AS t5
        FROM events
    ), e AS (
        SELECT event_type, v, t5 AS wstart FROM w
        UNION ALL
        SELECT event_type, v, t5 - INTERVAL 5 MINUTE AS wstart FROM w
    )
    SELECT wstart, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS sum_value
    FROM e GROUP BY wstart, event_type
    """,
    doc="hopping (sliding) window aggregate: 10-minute windows every "
    "5 minutes per event_type — Spark's native F.window(slide) Expand "
    "(each row fans out to window/slide = 2 windows) feeding ONE "
    "partial+final hash agg; the oracle builds the same two window "
    "starts per row explicitly (both engines floor sub-second "
    "timestamps onto the same epoch-aligned 5-min grid: DuckDB "
    "time_bucket's 2000-01-03 origin is divisible by 300 s)",
    survey_ref="SURVEY §2.10 session/tumbling/sliding windows — absent "
    "in the reference (daily batch cadence only), required of the "
    "engine; streaming/windows.py holds the watermarked variant",
)
def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the Expand doubles rows BEFORE the shuffle, but partial
    aggregation collapses each (window, type) group map-side, so the
    exchange carries ~2x the group count, not 2x the events. No joins,
    no windows-over-sort — the same plan at 10^10 rows."""
    ev = _t(spark, sf_dir, "events")
    from ethereum_etl_airflow_spark.queries import _dec_sum

    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum(F.col("value"), "sum_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
