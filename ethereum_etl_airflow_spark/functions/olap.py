"""Skew-defusing salted aggregation + ROLLUP hierarchy totals.

Two OLAP primitives every 100 TB deployment leans on:

* **Two-phase salted aggregation** — the explicit form of the skew
  handling the north rule requires ("salted hash partitions to defuse
  hot-key skew"): when a groupBy key has a handful of enormous groups
  (here ``event_type``: 5 values over the whole stream), a single
  exchange hashes each hot key to ONE reducer. Salting splits every
  hot group across ``_SALTS`` partial groups first (uniform by
  construction), then combines the tiny partial table. The CDC sink
  applies the same idea structurally (hash buckets on doc_id); this
  operator is the query-side pattern, result-identical to the naive
  plan — which is exactly what the oracle asserts.

* **ROLLUP hierarchy totals** — subtotal/grand-total lattices the
  reference publishes as stacked enrich views (per-day, per-type,
  overall); one ROLLUP pass computes all levels in a single shuffle
  via Catalyst's Expand, instead of N scans.

Scale notes: phase 1 of the salted agg is a shuffle on
(key, salt) — max group size drops by ``_SALTS``×; phase 2 moves only
``|keys| * _SALTS`` pre-aggregated rows (bytes, not data). Decimal
partials keep both phases exactly associative, so the two-phase
result is bit-identical to the one-phase oracle. ROLLUP's Expand
multiplies rows ×(levels+1) BEFORE the exchange, but map-side partial
aggregation collapses them within each task first — one exchange
total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register

#: salt fan-out for hot keys (in production: ~2-4x executor count)
_SALTS = 32


@register(
    "agg_salted_hotkeys",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
    doc="two-phase salted aggregation over a 5-hot-key column: partial "
    "agg on (key, salt) then final combine — result-identical to the "
    "naive single-exchange plan, max partition size cut by the salt fan-out",
    survey_ref="north rule skew handling (salted hash partitions); "
    "SURVEY §2 A-family aggregations under hot keys",
)
def agg_salted_hotkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 1 shuffles on (event_type, _salt) — every hot group splits
    into _SALTS uniform partials; phase 2 combines |keys|*_SALTS rows.
    Decimal partials are exactly associative, so the split changes the
    plan, never the values."""
    ev = _t(spark, sf_dir, "events")
    partial = (
        ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALTS)))
        .groupBy("event_type", "_salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("pv"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("long").alias("n_events"),
        F.sum("pv").cast("double").alias("total_value"),
    )


@register(
    "events_rollup_totals",
    oracle="""
    SELECT coalesce(event_type, '(all)') AS etype,
           coalesce(CAST(CAST(date_trunc('day', ts) AS DATE) AS STRING),
                    '(all)') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP(event_type, CAST(date_trunc('day', ts) AS DATE))
    """,
    doc="ROLLUP(event_type, day) subtotal lattice: per-(type,day), "
    "per-type, and grand totals in ONE Expand + exchange",
    survey_ref="reference stacked enrich views (per-day / per-type / "
    "overall aggregates) computed as one ROLLUP pass",
)
def events_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst Expand emits one row per lattice level; map-side partial
    agg collapses them before the single exchange. NULL group markers
    are coalesced to '(all)' AFTER grouping (synthetic data has no
    natural NULL keys to collide with)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
        "value",
    )
    rolled = ev.rollup("event_type", "d").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_value"),
    )
    return rolled.select(
        F.coalesce(F.col("event_type"), F.lit("(all)")).alias("etype"),
        F.coalesce(F.col("d").cast("string"), F.lit("(all)")).alias("day"),
        "n_events",
        "total_value",
    )


#: pivot columns fixed up front — Spark skips the extra distinct-values
#: job AND the plan stays a single agg (never one pass per column)
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "events_pivot_daily",
    oracle=f"""
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS STRING) AS day,
           {", ".join(
               f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}"
               for t in _EVENT_TYPES
           )}
    FROM events
    GROUP BY 1
    """,
    doc="PIVOT day x event_type count matrix (explicit value list -> "
    "single-agg plan, no distinct-values pre-pass)",
    survey_ref="wide feature-matrix shape the reference's enrich views "
    "feed BI with; SURVEY §2 A-family as a pivoted projection",
)
def events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pivot(col, values)`` WITH the value list: one shuffle, one agg
    — omitting the list costs an extra distinct job and blocks plan
    caching at 10^10 rows. Count never sees nulls, so the pivoted
    cells need no coalesce; cast long matches the oracle's BIGINT."""
    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").cast("string").alias("day"),
        "event_type",
    )
    piv = (
        ev.groupBy("day")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))  # count("*") is rejected inside Pivot
    )
    return piv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in _EVENT_TYPES]
    )


@register(
    "orders_cohort_retention",
    oracle="""
    WITH first_m AS (
        SELECT o_custkey,
               CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS cohort
        FROM orders GROUP BY o_custkey
    )
    SELECT CAST(f.cohort AS STRING) AS cohort_month,
           CAST((year(CAST(date_trunc('month', o.o_orderdate) AS DATE))
                 - year(f.cohort)) * 12
                + (month(CAST(date_trunc('month', o.o_orderdate) AS DATE))
                   - month(f.cohort)) AS INT) AS month_offset,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_custs
    FROM orders o JOIN first_m f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
    """,
    doc="cohort retention matrix: customers bucketed by first-order "
    "month, distinct actives counted per months-since-cohort offset",
    survey_ref="reference enrich-stage BI aggregates; J3 aggregating "
    "join + A4 COUNT(DISTINCT) composed into the retention shape",
)
def orders_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order month = ONE per-customer MIN agg; the join back is
    custkey-co-partitioned with that agg (sort-merge reuses the
    partitioning), then one distinct-count agg on the tiny
    (cohort, offset) grid. Month offset is integer year/month
    arithmetic — portable bit-for-bit, unlike months_between's double."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    first_m = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("cohort")
    )
    j = o.join(first_m, "o_custkey").select(
        "o_custkey",
        F.col("cohort").cast("string").alias("cohort_month"),
        (
            (F.year(F.date_trunc("month", "o_orderdate")) - F.year("cohort")) * 12
            + (F.month(F.date_trunc("month", "o_orderdate")) - F.month("cohort"))
        )
        .cast("int")
        .alias("month_offset"),
    )
    return j.groupBy("cohort_month", "month_offset").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_custs")
    )


@register(
    "events_cube_slice",
    oracle="""
    SELECT coalesce(event_type, '(all)') AS etype,
           coalesce(CAST(CAST(date_trunc('day', ts) AS DATE) AS STRING),
                    '(all)') AS day,
           CAST(GROUPING(event_type) * 2
                + GROUPING(CAST(date_trunc('day', ts) AS DATE)) AS INT)
               AS lattice_level,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CUBE(event_type, CAST(date_trunc('day', ts) AS DATE))
    """,
    doc="CUBE(event_type, day): the full 4-slice lattice (cell, per-day, "
    "per-type, grand total) in ONE Expand + exchange, with grouping_id "
    "exposing the slice so consumers filter a level instead of "
    "re-aggregating",
    survey_ref="ROLLUP sibling (events_rollup_totals) completed to the "
    "CUBE lattice the reference's stacked per-day AND per-type enrich "
    "views imply; SURVEY §2 A-family",
)
def events_cube_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same single-exchange Expand discipline as the ROLLUP: 4 lattice
    rows per input row BEFORE the exchange, collapsed by map-side
    partial agg within each task. grouping_id() bit order (first col =
    MSB) matches GROUPING(a)*2 + GROUPING(b) in the oracle exactly."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
        "value",
    )
    cubed = ev.cube("event_type", "d").agg(
        F.grouping_id().cast("int").alias("lattice_level"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_value"),
    )
    return cubed.select(
        F.coalesce(F.col("event_type"), F.lit("(all)")).alias("etype"),
        F.coalesce(F.col("d").cast("string"), F.lit("(all)")).alias("day"),
        "lattice_level",
        "n_events",
        "total_value",
    )
