"""Ordered-funnel conversion analysis over the event stream.

Stage-ordered funnels (signup -> click -> purchase, each within a
bounded window of the previous stage) are the canonical event-
analytics query the reference's enrich stage feeds downstream BI with
(dags/resources/stages/enrich aggregated event tables). Semantically
it is a chain of "earliest qualifying successor" lookups — the same
adjacent-sequence discipline as J8 (`adjacent_event_lag`), but across
event *types* with a time bound instead of adjacent rows.

Scale notes (100 TB of events): each stage is a per-user MIN
aggregation (map-side combine, uniform user_id keys) followed by an
equi-join on user_id with the time-band predicate applied as a join
residual — Catalyst plans sort-merge joins co-partitioned on user_id,
and AQE coalesces the post-filter stages. The stage tables shrink
monotonically (survivors only), so each successive join is cheaper;
at production scale the user-grain tables are bucketable by user_id
so all three stages share ONE physical partitioning and the joins
become zero-shuffle. No window over the full stream is ever taken —
min-per-user aggregations, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register

#: max hours allowed between consecutive funnel stages
_BAND_H = 72


@register(
    "events_funnel_conversion",
    oracle=f"""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT s1.user_id, min(e.ts) AS t2
        FROM s1 JOIN events e ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL {_BAND_H} HOUR
        GROUP BY s1.user_id
    ),
    s3 AS (
        SELECT s2.user_id, min(e.ts) AS t3
        FROM s2 JOIN events e ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s2.t2 + INTERVAL {_BAND_H} HOUR
        GROUP BY s2.user_id
    )
    SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_signup,
           CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase
    """,
    doc="3-stage ordered funnel (signup->click->purchase, 72h bands): "
    "earliest-qualifying-successor joins per user, stage survivor counts",
    survey_ref="enrich-stage event aggregation (SURVEY §2 A-family) + J8 "
    "adjacent-sequence lookup generalized across event types",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three per-user MIN aggs chained by user_id equi-joins with a
    time-band residual; final scalar counts via crossJoin of 1-row
    aggregates (no data movement — each side is already a scalar)."""
    ev = _t(spark, sf_dir, "events")
    band = F.expr(f"INTERVAL {_BAND_H} HOURS")

    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        s1.join(ev.select("user_id", "event_type", "ts"), "user_id")
        .where(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + band)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        s2.join(ev.select("user_id", "event_type", "ts"), "user_id")
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + band)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").cast("long").alias("n_signup"))
        .crossJoin(s2.agg(F.count("*").cast("long").alias("n_click")))
        .crossJoin(s3.agg(F.count("*").cast("long").alias("n_purchase")))
    )
