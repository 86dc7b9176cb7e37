"""Temporal relational operators: as-of (point-in-time) join,
gap-based sessionization, banded range join.

The reference's pipelines are event-time pipelines (block-range
exports keyed by timestamp partitions — build_export_dag.py exports a
day, load/parse consume `date(block_timestamp) = '{{ds}}'` slices),
but BigQuery SQL gives it no as-of / interval-join primitive; analysts
hand-roll them with correlated subqueries. This module provides the
three temporal operators a training-data / event pipeline needs, each
expressed Spark-first so the physical plan is a plain sort-shuffle or
equi-join — never a nested-loop:

* ``asof_join_last_order`` — the union-sort trick: tag build and probe
  rows, union them on (key, time, side), ONE window pass carries the
  most recent build row forward to every probe row.  A single shuffle
  on the join key; no range explosion; at 100 TB this is the same
  plan a hand-written MergeJoin-based ASOF would produce.
* ``sessionize_events`` — classic lag-gap → cumulative-sum session
  ids, one shuffle on user_id.
* ``range_join_banded`` — a pure time-range join (no equi key) made
  scalable by banding: bucket the build side by a band the width of
  the range predicate, explode each probe row to the (2) candidate
  bands, equi-join on the band, post-filter exactly.  Candidate count
  is O(rows-per-band), not O(N·M) — Catalyst gets an ordinary
  shuffled hash join instead of BroadcastNestedLoop.

Each operator has a value-identical DuckDB oracle; the as-of oracle
deliberately uses DuckDB's native ``ASOF LEFT JOIN`` operator — a
completely independent algorithm validating the union-sort result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ethereum_etl_airflow_spark.queries import _t, register

# ---------------------------------------------------------------------------
# As-of join: for every event, the most recent order (by the same
# customer) at or before the event timestamp.
# ---------------------------------------------------------------------------


def _asof_build_probe(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Shared build/probe construction: build deduplicated to one row
    per (key, time) with deterministic ties (greatest o_orderkey wins —
    same rule as the oracle)."""
    ev = _t(spark, sf_dir, "events")
    od = _t(spark, sf_dir, "orders")
    tie = W.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    build = (
        od.withColumn("rn", F.row_number().over(tie))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("t"),
            F.struct(
                F.col("o_orderkey").alias("last_orderkey"),
                F.col("o_orderdate").alias("last_orderdate"),
                F.col("o_totalprice").alias("last_totalprice"),
            ).alias("payload"),
        )
    )
    probe = ev.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
    )
    return build, probe


_ASOF_PAYLOAD_T = (
    "struct<last_orderkey:bigint,last_orderdate:timestamp,last_totalprice:double>"
)


def _asof_output(df: DataFrame) -> DataFrame:
    return df.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("asof.last_orderkey").alias("last_orderkey"),
        F.col("asof.last_orderdate").alias("last_orderdate"),
        F.col("asof.last_totalprice").alias("last_totalprice"),
    )


@register(
    "asof_join_last_order",
    oracle="""
    WITH b AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                      ORDER BY o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id,
           b.o_orderkey   AS last_orderkey,
           b.o_orderdate  AS last_orderdate,
           b.o_totalprice AS last_totalprice
    FROM events e ASOF LEFT JOIN b
      ON e.user_id = b.o_custkey AND e.ts >= b.o_orderdate
    """,
    doc="as-of (point-in-time) LEFT join via the union-sort trick; "
    "oracle uses DuckDB's native ASOF JOIN (independent algorithm)",
    survey_ref="§2 J8 adjacent-sequence lookup generalized; "
    "ref load/sqls/enrich_transactions.sql block-time alignment",
)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-sort as-of join.

    Scale shape: ONE shuffle on the join key (the window partition),
    then a linear window pass per key.  No BroadcastNestedLoopJoin
    anywhere in the plan.  Caveat at extreme scale: all of one key's
    rows pass through one task — for hot keys use
    :func:`asof_join_bucketed`, which bounds every task by the time-
    bucket width instead.
    """
    build, probe = _asof_build_probe(spark, sf_dir)
    b = build.select("k", "t", F.lit(0).alias("side"), "payload", F.lit(None).cast("long").alias("event_id"))
    p = probe.select(
        "k", "t", F.lit(1).alias("side"),
        F.lit(None).cast(_ASOF_PAYLOAD_T).alias("payload"), "event_id",
    )
    # build rows sort BEFORE probe rows at the same timestamp (side 0
    # < 1) => the `>=` inclusive as-of semantics; last(ignorenulls)
    # carries the latest build payload forward to each probe row.
    w = (
        W.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return _asof_output(
        b.unionByName(p)
        .withColumn("asof", F.last("payload", ignorenulls=True).over(w))
        .where(F.col("side") == 1)
    )


#: time-bucket width for the skew-proof as-of join (seconds).  Pick it
#: so one (key, bucket) of events fits a task comfortably; the carry
#: pass is O(time-range / width) rows per key regardless of volume.
ASOF_BUCKET_SEC = 90 * 86400


@register(
    "asof_join_bucketed",
    oracle="""
    WITH b AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                      ORDER BY o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id,
           b.o_orderkey   AS last_orderkey,
           b.o_orderdate  AS last_orderdate,
           b.o_totalprice AS last_totalprice
    FROM events e ASOF LEFT JOIN b
      ON e.user_id = b.o_custkey AND e.ts >= b.o_orderdate
    """,
    doc="skew-proof as-of join: time-bucketed two-phase plan — per-"
    "(key,bucket) local pass + bucket-grain carry window; value-"
    "identical to asof_join_last_order, no per-key global window",
    survey_ref="§2 J8 at hot-key scale; same oracle as "
    "asof_join_last_order (DuckDB native ASOF JOIN)",
)
def asof_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe as-of join.

    The union-sort plan funnels each key through ONE task; a key with
    10^9 probe rows stalls the stage.  This variant decomposes by time
    bucket:

    1. per-(key, bucket) best build row — hash agg, map-side combine;
    2. bucket-grain carry: for every bucket that has probes, the best
       build from any EARLIER bucket — a window over bucket summaries
       (O(active buckets) rows per key, independent of row volume);
    3. per-(key, bucket) union-sort of [carry pseudo-build, in-bucket
       builds, probes] — every window partition is bounded by the
       bucket width, so a hot key parallelizes across its buckets.
    """
    build, probe = _asof_build_probe(spark, sf_dir)
    def bucket(df: DataFrame) -> DataFrame:
        epoch = F.col("t").cast("timestamp").cast("long")
        return df.withColumn("b", F.floor(epoch / ASOF_BUCKET_SEC).cast("long"))

    build = bucket(build)
    probe = bucket(probe)

    # 1. best build per (key, bucket): unique (k,t) after dedup, so the
    # max over (t, orderkey) is the bucket's latest build
    best = build.groupBy("k", "b").agg(
        F.max_by("payload", F.struct(F.col("t"), F.col("payload.last_orderkey"))).alias(
            "best"
        )
    )

    # 2. carry: per probe-bucket, the best build of strictly-earlier
    # buckets.  Marks (side 0) sort before same-bucket builds (side 1),
    # so a bucket's own builds never leak into its carry.
    marks = probe.select("k", "b").distinct().select(
        "k", "b", F.lit(0).alias("side"), F.lit(None).cast(best.schema["best"].dataType).alias("best")
    )
    summaries = best.select("k", "b", F.lit(1).alias("side"), "best")
    cw = (
        W.partitionBy("k")
        .orderBy("b", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carry = (
        marks.unionByName(summaries)
        .withColumn("carry", F.last("best", ignorenulls=True).over(cw))
        .where(F.col("side") == 0)
        .select("k", "b", "carry")
    )

    # 3. bounded per-(key,bucket) union-sort: carry first (t null sorts
    # ahead), then builds, then probes at equal t (inclusive >=)
    carry_rows = carry.where(F.col("carry").isNotNull()).select(
        "k", "b", F.lit(None).cast("timestamp").alias("t"),
        F.lit(-1).alias("side"), F.col("carry").alias("payload"),
        F.lit(None).cast("long").alias("event_id"),
    )
    build_rows = build.select(
        "k", "b", "t", F.lit(0).alias("side"), "payload",
        F.lit(None).cast("long").alias("event_id"),
    )
    probe_rows = probe.select(
        "k", "b", "t", F.lit(1).alias("side"),
        F.lit(None).cast(_ASOF_PAYLOAD_T).alias("payload"), "event_id",
    )
    w = (
        W.partitionBy("k", "b")
        .orderBy(F.asc_nulls_first("t"), "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return _asof_output(
        carry_rows.unionByName(build_rows)
        .unionByName(probe_rows)
        .withColumn("asof", F.last("payload", ignorenulls=True).over(w))
        .where(F.col("side") == 1)
    )


# ---------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session per user.
# ---------------------------------------------------------------------------


@register(
    "sessionize_events",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM seq
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, session_no
    """,
    doc="gap-based sessionization (30-min inactivity): lag-gap flags "
    "cumsum'd into session ids, then per-session aggregates",
    survey_ref="§2.10 event-time semantics; streaming/windows.py session "
    "windows are the streaming twin of this batch operator",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on user_id; both windows and the final groupBy
    share that partitioning, so Catalyst runs the whole thing in a
    single exchange.  Ties broken by event_id => deterministic."""
    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(F.col("ts").cast("timestamp").cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_no", F.sum("is_new").over(cum).cast("long"))
        .groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Banded range join: for each error event, purchases (ANY user) in the
# preceding 10 minutes.  No equi key at all — the band IS the join key.
# ---------------------------------------------------------------------------

_BAND_SEC = 600  # band width == range width => probe explodes to exactly 2 bands


@register(
    "range_join_banded",
    oracle="""
    SELECT er.event_id, COUNT(p.event_id) AS n_purchases_10m
    FROM events er LEFT JOIN events p
      ON p.event_type = 'purchase'
     AND p.ts >= er.ts - INTERVAL 10 MINUTE
     AND p.ts <  er.ts
    WHERE er.event_type = 'error'
    GROUP BY er.event_id
    """,
    doc="pure time-range join (no equi key) via banding: band width = "
    "range width, probe explodes to 2 candidate bands, equi-join on "
    "band, exact post-filter",
    survey_ref="§2 J8/J9 temporal cross-checks; avoids "
    "BroadcastNestedLoopJoin that a naive inequality join produces",
)
def range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle's naive inequality LEFT JOIN is O(N·M) (fine for
    DuckDB at sf0.01); the Spark side turns it into an equi-join on
    floor(epoch/600): purchases land in 1 band, each error probes
    band and band-1, the exact predicate filters the (tiny) band-local
    candidates.  At 100 TB candidate volume is O(rows per 10-min
    window), the join is an ordinary shuffled hash join, and AQE can
    still split a skewed band.
    """
    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.floor(F.col("ts").cast("timestamp").cast("long") / _BAND_SEC).alias("band"),
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id",
        F.col("ts").alias("e_ts"),
        F.floor(F.col("ts").cast("timestamp").cast("long") / _BAND_SEC).alias("band0"),
    )
    probes = errors.withColumn(
        "band", F.explode(F.array(F.col("band0") - 1, F.col("band0")))
    )
    hits = (
        probes.join(purchases, "band")
        .where(
            (F.col("p_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("p_ts") < F.col("e_ts"))
        )
        .groupBy("event_id")
        .agg(F.count("p_id").alias("n_purchases_10m"))
    )
    return (
        errors.select("event_id")
        .join(hits, "event_id", "left")
        .select(
            "event_id",
            F.coalesce(F.col("n_purchases_10m"), F.lit(0).cast("long")).alias(
                "n_purchases_10m"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Rolling event-time window: per-user trailing-1h aggregates on every
# event row (a RANGE frame, not a ROWS frame — the frame is defined by
# time distance, so bursts and gaps are handled correctly).
# ---------------------------------------------------------------------------


@register(
    "rolling_window_stats",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_events_1h,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_value_1h
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)::BIGINT
                 RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
    doc="per-user trailing-1h rolling count/sum on every event "
    "(event-time RANGE frame; exact decimal sum)",
    survey_ref="§2.6 W1-W3 window family + §2.10 event-time "
    "semantics; the batch twin of streaming/windows.py sliding "
    "windows",
)
def rolling_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window features (the classic velocity/abuse signal
    and a standard training-feature shape). ONE shuffle on user_id;
    Spark's window evaluator maintains RANGE frames by sliding two
    pointers with add/remove aggregation, so each partition is a
    single ordered pass, not O(rows x frame). Frames defined by the
    integer-second epoch are timezone-free (session tz pinned UTC;
    DuckDB ``epoch`` is UTC by construction). Ties at equal epoch
    belong to the same frame on both engines — RANGE frames are
    value-based, so no ordering nondeterminism leaks into results."""
    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-3599, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_events_1h"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("sum_value_1h"),
    )
