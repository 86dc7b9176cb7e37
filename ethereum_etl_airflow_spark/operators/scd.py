"""CDC history shaping: SCD Type-2 intervals + out-of-order arrival audit.

The CDC sink (``operators/cdc.py``) folds a change feed to CURRENT
state (last-writer-wins).  Two sibling shapes every CDC deployment
also needs, both pure window passes — one shuffle on the key, no
joins, no state store:

* **SCD Type-2 history** — every change event becomes a validity
  interval ``[seq, next_seq)`` per key, the standard
  slowly-changing-dimension form (Kimball SCD2) that lets a training
  pipeline ask "what was this document's payload AS OF sequence s?"
  without replaying the feed.  ``lead()`` over (key ORDER BY seq)
  computes the closing edge; the open interval (lead IS NULL) is the
  current row — exactly the row ``cdc_lww_fold`` keeps.  At 10^10
  events this is ONE exchange on doc_id and a sort within partitions;
  the same plan shape as the sink's fold, so it scales identically.

* **Out-of-order arrival audit** — the north rule's exactly-once
  replay only holds if late/duplicate tolerance is measured, not
  assumed.  Per key, an event arrived LATE iff its sequence number is
  below the running maximum of everything that arrived before it
  (arrival order = event time, tiebroken by seq so reruns agree).
  A running-max window ``ROWS UNBOUNDED PRECEDING AND 1 PRECEDING``
  plus a conditional count gives per-key lateness counts in the same
  single exchange.  The CDC tailer tolerates these rows (LWW by seq);
  this audit is how an operator SEES them — feeding the lateness
  histogram that sizes watermarks (``streaming/windows.py``).

Reference parity: the reference keeps only current state per key
(merge_table.sql:1-15 delete-insert; amended_tokens.sql ANY_VALUE) and
relies on re-export for history; SCD2-from-the-feed is the engine-side
upgrade.  The lateness audit mirrors the reference's verify DAGs'
monotone block-number checks
(verify_streaming/blocks_count.sql discipline) generalized per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register


@register(
    "cdc_scd2_history",
    oracle="""
    SELECT user_id AS doc_id,
           event_id AS valid_from_seq,
           LEAD(event_id) OVER w - 1 AS valid_to_seq,
           (LEAD(event_id) OVER w IS NULL) AS is_current,
           event_type AS op,
           CAST(CAST(value AS DECIMAL(38,6)) AS DOUBLE) AS payload
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    doc="SCD Type-2 from the change feed: each event becomes a validity "
    "interval [seq, next_seq) per key via one lead() window — the "
    "open interval is the current row, point-in-time queries become "
    "range predicates instead of feed replays",
    survey_ref="merge_table.sql:1-15 keeps current-only (M2); SCD2 "
    "history is the temporal upgrade; sibling of cdc_lww_fold",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exchange on the key + in-partition sort; the lead() closing
    edge and the is_current flag come from the same window pass.  The
    plan is identical in shape to the LWW fold, so whatever partition
    count carries the sink carries this."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    nxt = F.lead("event_id").over(w)
    return ev.select(
        F.col("user_id").alias("doc_id"),
        F.col("event_id").alias("valid_from_seq"),
        (nxt - 1).alias("valid_to_seq"),
        nxt.isNull().alias("is_current"),
        F.col("event_type").alias("op"),
        F.col("value").cast("decimal(38,6)").cast("double").alias("payload"),
    )


@register(
    "cdc_out_of_order_audit",
    oracle="""
    WITH arr AS (
        SELECT user_id, event_id,
               MAX(event_id) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS seen_max
        FROM events
    )
    SELECT user_id,
           COUNT(*)::BIGINT AS n_events,
           SUM(CASE WHEN event_id < seen_max THEN 1 ELSE 0 END)::BIGINT
               AS n_late,
           MAX(CASE WHEN event_id < seen_max
                    THEN seen_max - event_id ELSE 0 END)::BIGINT
               AS max_displacement
    FROM arr GROUP BY user_id
    """,
    doc="late-arrival audit per key: an event is LATE iff its seq is "
    "below the running max of earlier arrivals (arrival order = event "
    "time, seq tiebreak); running-max window + conditional agg in one "
    "exchange — the lateness histogram that sizes watermarks",
    survey_ref="verify_streaming monotone block checks generalized per "
    "key; §2.10 late/duplicate tolerance, measured not assumed",
)
def cdc_out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window and the groupBy share the user_id hash partitioning —
    Catalyst reuses the exchange, so the whole audit is one shuffle.
    max_displacement (how far back the worst straggler reached) is the
    number a watermark delay must dominate."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    arr = ev.select(
        "user_id",
        "event_id",
        F.max("event_id").over(w).alias("seen_max"),
    )
    late = F.col("event_id") < F.col("seen_max")
    return arr.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(late.cast("int")).cast("long").alias("n_late"),
        F.max(
            F.when(late, F.col("seen_max") - F.col("event_id")).otherwise(0)
        )
        .cast("long")
        .alias("max_displacement"),
    )


@register(
    "cdc_lateness_histogram",
    oracle="""
    WITH arr AS (
        SELECT epoch(ts)::BIGINT AS ts_sec,
               MAX(epoch(ts)::BIGINT) OVER (
                   ORDER BY event_id % 8, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS seen_max
        FROM events
    ), b AS (
        SELECT CASE
                 WHEN seen_max IS NULL OR seen_max - ts_sec <= 0 THEN -1
                 ELSE length(bin(2 * (seen_max - ts_sec) - 1)) - 1
               END::BIGINT AS bucket
        FROM arr
    )
    SELECT bucket,
           CASE WHEN bucket < 0 THEN 0
                ELSE (1::BIGINT << bucket) END::BIGINT AS ceil_sec,
           COUNT(*)::BIGINT AS n
    FROM b GROUP BY bucket
    """,
    doc="event-time lateness histogram for watermark sizing: lateness "
    "= running max event-time over earlier arrivals minus own, kept "
    "as exact log2 buckets (bucket b covers (2^(b-1), 2^b]); arrival "
    "order simulates an 8-reader partitioned source merged reader-"
    "by-reader (arrival = reader<<40 | offset) so real cross-reader "
    "lateness exists to measure; Spark side uses the two-phase "
    "chunked scan so no stage single-threads the feed — the oracle's "
    "naive global window cross-checks it",
    survey_ref="§2.10 late tolerance measured, not assumed; reference "
    "*_have_latest.sql freshness sensors generalized to a "
    "distribution; seq-displacement sibling cdc_out_of_order_audit",
)
def cdc_lateness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival order = (event_id % 8, event_id) — an 8-reader source
    drained reader-at-a-time, encoded as one monotone arrival integer
    (reader << 40 | offset); event time = ts. The two-phase scan
    (streaming/lateness.py) chunks at 4096 here so the test corpus
    actually exercises the multi-chunk merge path."""
    from ethereum_etl_airflow_spark.streaming.lateness import (
        lateness_histogram,
    )

    ev = _t(spark, sf_dir, "events").withColumn(
        "arrival",
        (F.col("event_id") % 8) * F.lit(1 << 40).cast("long")
        + F.col("event_id"),
    )
    return lateness_histogram(
        ev, arrival_col="arrival", ts_col="ts", chunk_size=4096
    )


@register(
    "cdc_snapshot_diff",
    oracle="""
    WITH cut AS (SELECT MAX(event_id) // 2 AS c FROM events),
    st AS (
        SELECT user_id AS doc_id,
               MAX(event_id) AS n_seq,
               max_by(event_type, event_id) AS n_op,
               MAX(CASE WHEN event_id <= cut.c THEN event_id END) AS o_seq,
               max_by(CASE WHEN event_id <= cut.c THEN event_type END,
                      CASE WHEN event_id <= cut.c THEN event_id END) AS o_op
        FROM events, cut GROUP BY 1
    ), cls AS (
        SELECT doc_id, o_seq, n_seq,
               (o_seq IS NOT NULL AND o_op <> 'error') AS has_old,
               (n_op <> 'error') AS has_new
        FROM st
    )
    SELECT doc_id,
           CASE WHEN NOT has_old THEN 'insert'
                WHEN NOT has_new THEN 'delete'
                ELSE 'update' END AS change,
           CASE WHEN has_old THEN o_seq END AS old_seq,
           CASE WHEN has_new THEN n_seq END AS new_seq
    FROM cls
    WHERE (has_old OR has_new)
      AND NOT (has_old AND has_new AND o_seq = n_seq)
    """,
    doc="snapshot diff between two feed positions (cut = half the max "
    "sequence, and the head) computed in ONE keyed aggregate: per key, "
    "max_by gives the LWW winner at the head and — via the "
    "null-when-past-the-cut conditional — the winner at the cut, so "
    "BOTH snapshot states fall out of a single shuffle with no "
    "self-join and no second scan; rows classify insert/update/delete "
    "with 'error' heads treated as deletes (the cdc_lww_fold rule) and "
    "unchanged keys suppressed",
    survey_ref="the relational twin of operators/changes.table_changes "
    "(CDF between versions) — merge_table.sql:1-15 delete-insert "
    "semantics diffed instead of applied; J4 full-outer classification "
    "folded into A2 arg-max",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The naive form is two LWW folds + a full outer join (three
    exchanges); folding the cut predicate into conditional max/max_by
    aggregates collapses it to ONE exchange on the key — at 10^10
    events the diff costs exactly what one fold costs. The cut scalar
    is a 1-row broadcast (no driver round-trip ordering hazard:
    max(event_id) is deterministic)."""
    ev = _t(spark, sf_dir, "events")
    cut = ev.agg(F.expr("max(event_id) DIV 2").alias("c"))
    in_cut = F.col("event_id") <= F.col("c")
    st = (
        ev.join(F.broadcast(cut))
        .groupBy(F.col("user_id").alias("doc_id"))
        .agg(
            F.max("event_id").alias("n_seq"),
            F.expr("max_by(event_type, event_id)").alias("n_op"),
            F.max(F.when(in_cut, F.col("event_id"))).alias("o_seq"),
            F.expr(
                "max_by(CASE WHEN event_id <= c THEN event_type END,"
                " CASE WHEN event_id <= c THEN event_id END)"
            ).alias("o_op"),
        )
    )
    has_old = F.col("o_seq").isNotNull() & (F.col("o_op") != "error")
    has_new = F.col("n_op") != "error"
    return (
        st.select(
            "doc_id",
            "o_seq",
            "n_seq",
            has_old.alias("has_old"),
            has_new.alias("has_new"),
        )
        .where(
            (F.col("has_old") | F.col("has_new"))
            & ~(
                F.col("has_old")
                & F.col("has_new")
                & (F.col("o_seq") == F.col("n_seq"))
            )
        )
        .select(
            "doc_id",
            F.when(~F.col("has_old"), F.lit("insert"))
            .when(~F.col("has_new"), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change"),
            F.when(F.col("has_old"), F.col("o_seq")).alias("old_seq"),
            F.when(F.col("has_new"), F.col("n_seq")).alias("new_seq"),
        )
    )
