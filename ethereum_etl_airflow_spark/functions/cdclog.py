"""CDC changelog surface: pre/post images, column-level patches,
transaction boundaries.

Three change-feed semantics every production CDC engine (Debezium →
lake, Delta CDF, Iceberg changelog scan) exposes beyond the row-level
LWW fold that `queries.cdc_lww_fold` / `operators/cdc.py` already
cover:

* **changelog images** — the diff between two feed positions emitted
  as a FULL changelog: ``insert`` / ``delete`` rows carry one image,
  updates carry TWO rows (``update_preimage`` + ``update_postimage``)
  — the Delta CDF `_change_type` contract, and the stream a downstream
  incremental aggregate needs to retract-then-apply. The engine-side
  twin is ``operators/changes.table_changes(changelog_mode="full")``;
  this query is the relational form the oracle can check.
* **column-level patch fold** — Debezium-style PARTIAL update events:
  an event carries only the columns it changed, and the folded row
  takes EACH column from the latest event that set it (per-column
  LWW, not per-row). Simulated on the events feed by the event type:
  ``click`` events patch only ``value``, ``view`` events patch only
  ``props``, every other type writes both.
* **transaction boundaries** — binlog events belong to source
  transactions and must not apply until the transaction's COMMIT
  marker arrives (Debezium's transaction-metadata topic). Simulated
  by grouping consecutive event ids into transactions and treating a
  ``purchase`` event as the commit marker: only events of committed
  transactions pass the gate.

Reference parity: the reference's load stage applies block-range
batches only after the range's completeness sensor fires
(`build_load_dag.py` wait_sensor → load ordering) — the transaction
gate generalizes that "apply only complete units" rule to in-band
markers; the changelog images generalize its stitch/diff rebuild
cadence (`build_partition_dag.py:157-220`).

Float discipline: payload doubles round-trip through DECIMAL(38,6) on
both engines (house rule, see queries.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ethereum_etl_airflow_spark.queries import _t, register

#: consecutive-event-id transaction width for the boundary simulation
TXN_WIDTH = 16


@register(
    "cdc_changelog_images",
    oracle="""
    WITH cut AS (SELECT MAX(event_id) // 2 AS c FROM events),
    st AS (
        SELECT user_id AS doc_id,
               MAX(event_id) AS n_seq,
               max_by(event_type, event_id) AS n_op,
               CAST(CAST(max_by(value, event_id) AS DECIMAL(38,6)) AS DOUBLE) AS n_val,
               MAX(CASE WHEN event_id <= cut.c THEN event_id END) AS o_seq,
               max_by(CASE WHEN event_id <= cut.c THEN event_type END,
                      CASE WHEN event_id <= cut.c THEN event_id END) AS o_op,
               CAST(CAST(max_by(CASE WHEN event_id <= cut.c THEN value END,
                                CASE WHEN event_id <= cut.c THEN event_id END)
                         AS DECIMAL(38,6)) AS DOUBLE) AS o_val
        FROM events, cut GROUP BY 1
    ), cls AS (
        SELECT doc_id, o_seq, n_seq, o_val, n_val,
               (o_seq IS NOT NULL AND o_op <> 'error') AS has_old,
               (n_op <> 'error') AS has_new
        FROM st
    )
    SELECT doc_id, 'insert' AS _change_type, n_seq AS seq, n_val AS payload
    FROM cls WHERE has_new AND NOT has_old
    UNION ALL
    SELECT doc_id, 'delete', o_seq, o_val
    FROM cls WHERE has_old AND NOT has_new
    UNION ALL
    SELECT doc_id, 'update_preimage', o_seq, o_val
    FROM cls WHERE has_old AND has_new AND o_seq <> n_seq
    UNION ALL
    SELECT doc_id, 'update_postimage', n_seq, n_val
    FROM cls WHERE has_old AND has_new AND o_seq <> n_seq
    """,
    doc="full changelog between two feed positions (cut = half the max "
    "sequence, and the head): inserts/deletes carry one image, updates "
    "carry update_preimage + update_postimage rows — the Delta-CDF "
    "_change_type contract a downstream retract/apply consumer needs; "
    "both snapshot states fall out of ONE keyed aggregate (the "
    "cdc_snapshot_diff trick) and the two update images come from an "
    "inline explode of that aggregate's row, never a second scan",
    survey_ref="operators/changes.table_changes(changelog_mode='full') "
    "is the engine-side twin over SnapshotTable versions; ref "
    "build_partition_dag.py:157-220 rebuild cadence, merge_table.sql "
    "delete-insert semantics emitted as a stream instead of applied",
)
def cdc_changelog_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: one exchange (the keyed aggregate) computes BOTH states
    per key via cut-conditional max/max_by; the pre/post fan-out is a
    generator over the keys-sized aggregate output (array build +
    filter + explode — no join back, no second scan). At 10^10 events
    this costs exactly one LWW fold."""
    ev = _t(spark, sf_dir, "events")
    cut = ev.agg(F.expr("max(event_id) DIV 2").alias("c"))
    in_cut = F.col("event_id") <= F.col("c")
    dec_d = lambda c: c.cast("decimal(38,6)").cast("double")  # noqa: E731
    st = (
        ev.join(F.broadcast(cut))
        .groupBy(F.col("user_id").alias("doc_id"))
        .agg(
            F.max("event_id").alias("n_seq"),
            F.expr("max_by(event_type, event_id)").alias("n_op"),
            dec_d(F.expr("max_by(value, event_id)")).alias("n_val"),
            F.max(F.when(in_cut, F.col("event_id"))).alias("o_seq"),
            F.expr(
                "max_by(CASE WHEN event_id <= c THEN event_type END,"
                " CASE WHEN event_id <= c THEN event_id END)"
            ).alias("o_op"),
            dec_d(
                F.expr(
                    "max_by(CASE WHEN event_id <= c THEN value END,"
                    " CASE WHEN event_id <= c THEN event_id END)"
                )
            ).alias("o_val"),
        )
    )
    has_old = F.col("o_seq").isNotNull() & (F.col("o_op") != "error")
    has_new = F.col("n_op") != "error"
    upd = has_old & has_new & (F.col("o_seq") != F.col("n_seq"))

    def img(kind: str, seq, val):
        return F.struct(
            F.lit(kind).alias("_change_type"),
            seq.alias("seq"),
            val.alias("payload"),
        )

    images = F.array(
        F.when(has_new & ~has_old, img("insert", F.col("n_seq"), F.col("n_val"))),
        F.when(has_old & ~has_new, img("delete", F.col("o_seq"), F.col("o_val"))),
        F.when(upd, img("update_preimage", F.col("o_seq"), F.col("o_val"))),
        F.when(upd, img("update_postimage", F.col("n_seq"), F.col("n_val"))),
    )
    return (
        st.select(
            "doc_id",
            F.explode(F.filter(images, lambda x: x.isNotNull())).alias("img"),
        )
        .select("doc_id", "img._change_type", "img.seq", "img.payload")
    )


@register(
    "cdc_column_patch_fold",
    oracle="""
    SELECT user_id AS doc_id,
           CAST(CAST(max_by(value, event_id) FILTER (WHERE event_type <> 'view')
                     AS DECIMAL(38,6)) AS DOUBLE) AS value_state,
           MAX(event_id) FILTER (WHERE event_type <> 'view') AS value_seq,
           max_by(props, event_id) FILTER (WHERE event_type <> 'click') AS props_state,
           MAX(event_id) FILTER (WHERE event_type <> 'click') AS props_seq
    FROM events GROUP BY 1
    """,
    doc="column-level LWW fold of partial-update (patch) events: each "
    "column of the folded row comes from the LATEST event that carried "
    "that column (click events patch only value, view events patch "
    "only props, other types write both) — the Debezium partial-image "
    "merge a row-level max_by would get wrong whenever the newest "
    "event didn't touch every column; per-column seq is kept as the "
    "column's own lineage",
    survey_ref="generalizes cdc_lww_fold (M2 keyed upsert) to "
    "column-grain writers; ref merge_table.sql UPDATE SET * becomes "
    "UPDATE SET <carried columns only>; §2.10 late/duplicate "
    "tolerance applies per column",
)
def cdc_column_patch_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: ONE hash aggregate — every per-column winner is a
    FILTER'd max/max_by riding the same exchange, with map-side
    partial combine collapsing hot keys before the shuffle (the same
    skew defense as fold_lww). The naive form — one fold per column +
    N-way join — would be N exchanges and N joins."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.col("user_id").alias("doc_id")).agg(
        F.expr("max_by(value, event_id) FILTER (WHERE event_type <> 'view')")
        .cast("decimal(38,6)")
        .cast("double")
        .alias("value_state"),
        F.expr("MAX(event_id) FILTER (WHERE event_type <> 'view')").alias(
            "value_seq"
        ),
        F.expr(
            "max_by(props, event_id) FILTER (WHERE event_type <> 'click')"
        ).alias("props_state"),
        F.expr("MAX(event_id) FILTER (WHERE event_type <> 'click')").alias(
            "props_seq"
        ),
    )


@register(
    "cdc_txn_boundary_filter",
    oracle=f"""
    SELECT event_id, event_id // {TXN_WIDTH} AS txn_id, user_id, event_type
    FROM (
        SELECT event_id, user_id, event_type,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY event_id // {TXN_WIDTH}) AS committed
        FROM events
    ) WHERE committed = 1
    """,
    doc="transaction-boundary gate: change events grouped into source "
    "transactions (consecutive-sequence blocks) apply ONLY when the "
    "transaction's commit marker ('purchase') is present — uncommitted "
    "or aborted transactions are held back in their entirety, the "
    "Debezium transaction-metadata contract that keeps a lake replica "
    "from exposing torn writes",
    survey_ref="generalizes the reference's wait_sensor→load ordering "
    "(build_load_dag.py: a block range loads only when its export is "
    "complete) to in-band commit markers; §2.10 completeness gating",
)
def cdc_txn_boundary_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: ONE exchange — the commit flag is a max window over the
    txn partition, so gating costs a single shuffle on txn_id (vs the
    2-exchange groupBy+join form). Txn blocks are bounded (binlog
    transactions), so the partition-by-txn window never skews."""
    ev = _t(spark, sf_dir, "events")
    txn = F.expr(f"event_id DIV {TXN_WIDTH}").alias("txn_id")
    committed = F.max(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ).over(W.partitionBy(F.expr(f"event_id DIV {TXN_WIDTH}")))
    return (
        ev.select("event_id", txn, "user_id", "event_type", committed.alias("c"))
        .where(F.col("c") == 1)
        .drop("c")
    )


#: portable bucket fan-out for the watermark audit (the table's real
#: buckets use Spark xxhash64 — hashing.bucket_of — which DuckDB can't
#: evaluate; the md5-family phash60 is the cross-engine stand-in)
WM_BUCKETS = 8


@register(
    "cdc_safe_watermark",
    oracle=f"""
    WITH b AS (
        SELECT (('0x' || substr(md5(CAST(user_id AS STRING)), 1, 15))::BIGINT)
                   % {WM_BUCKETS} AS bucket,
               event_id
        FROM events
    ), heads AS (
        SELECT bucket, MAX(event_id) AS head_seq, COUNT(*) AS n_events
        FROM b GROUP BY bucket
    )
    SELECT bucket, head_seq, n_events,
           MIN(head_seq) OVER () AS safe_watermark,
           head_seq - MIN(head_seq) OVER () AS lag_behind_head
    FROM heads
    """,
    doc="safe-watermark derivation: per-partition (bucket) head "
    "sequence, the GLOBAL safe point = min over buckets — no event "
    "older than it can still arrive once every partition passed it, so "
    "tombstones below it are GC-safe (SnapshotTable.expire_tombstones' "
    "input) and readers below it see immutable history; per-bucket lag "
    "exposes the straggler partition that holds the watermark back",
    survey_ref="§2.10 watermark/lateness + M3 delete/GC: the watermark "
    "FEEDING expire_tombstones, derived the way Kafka-consumer / "
    "streaming engines take min-across-partitions of per-partition "
    "high-water marks; ref analogue: block-range completeness sensors "
    "gating loads (build_export_dag wait sensors)",
)
def cdc_safe_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: one hash aggregate to bucket grain (map-side combined —
    the fact never shuffles more than B partial rows per task), then
    the global-min window over B=8 rows. At 10^10 events this is the
    cheapest possible full-feed audit: O(input) scan, O(buckets)
    everything else."""
    from ethereum_etl_airflow_spark.functions.hashing import phash60

    ev = _t(spark, sf_dir, "events")
    heads = ev.groupBy(
        (phash60(F.col("user_id").cast("string")) % WM_BUCKETS).alias("bucket")
    ).agg(
        F.max("event_id").alias("head_seq"),
        F.count("*").alias("n_events"),
    )
    w = W.partitionBy()
    return heads.select(
        "bucket",
        "head_seq",
        "n_events",
        F.min("head_seq").over(w).alias("safe_watermark"),
        (F.col("head_seq") - F.min("head_seq").over(w)).alias("lag_behind_head"),
    )


def multiplex_feeds(feeds, key: str = "doc_id", seq: str = "seq") -> DataFrame:
    """Merge N change feeds with source priority: the winning row per
    key has the highest (seq, source_rank) — seq ties (the same change
    observed via two routes, e.g. a backfill export and the live
    binlog tail) resolve to the higher-priority source. One union +
    ONE hash aggregate (max_by with map-side partial combine) — no
    window sort, no self-join; the same skew-proof shape as fold_lww.

    ``feeds`` is a list of (DataFrame, rank:int); higher rank wins ties.
    """
    from functools import reduce

    tagged = [
        df.withColumn("_src_rank", F.lit(int(r)).cast("int")) for df, r in feeds
    ]
    allf = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), tagged)
    cols = [c for c in allf.columns if c != key]
    winner = F.max_by(
        F.struct(*cols), F.struct(F.col(seq), F.col("_src_rank"))
    )
    return (
        allf.groupBy(key)
        .agg(winner.alias("_w"))
        .select(key, *[F.col(f"_w.{c}").alias(c) for c in cols])
    )


@register(
    "cdc_multiplex_priority",
    oracle="""
    WITH a AS (
        SELECT CAST(event_id AS VARCHAR) AS doc_id, event_id AS seq,
               0 AS r, CAST(value AS DOUBLE) AS val
        FROM events
        UNION ALL
        SELECT CAST(event_id AS VARCHAR), event_id, 1,
               CAST(value AS DOUBLE) * 3
        FROM events WHERE event_id % 2 = 0
    )
    SELECT doc_id,
           arg_max(r, seq * 2 + r) AS src_rank,
           arg_max(val, seq * 2 + r) AS val
    FROM a GROUP BY doc_id
    """,
    doc="multi-source CDC multiplex: a full backfill feed (rank 0) and "
    "a live feed covering even keys at the SAME seq (rank 1) merge "
    "with priority tie-break — even keys take the live image, odd "
    "keys keep the backfill; one union + one max_by hash agg",
    survey_ref="the reference's dual ingestion routes (daily export "
    "MERGE vs externally-streamed live tables, "
    "build_verify_streaming_dag.py:95-100) reconciled by priority; "
    "M2 keyed upsert generalized to N sources",
)
def cdc_multiplex_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    backfill = ev.select(
        F.col("event_id").cast("string").alias("doc_id"),
        F.col("event_id").alias("seq"),
        F.col("value").cast("double").alias("val"),
    )
    live = ev.where(F.col("event_id") % 2 == 0).select(
        F.col("event_id").cast("string").alias("doc_id"),
        F.col("event_id").alias("seq"),
        (F.col("value").cast("double") * 3).alias("val"),
    )
    merged = multiplex_feeds([(backfill, 0), (live, 1)])
    return merged.select(
        "doc_id", F.col("_src_rank").alias("src_rank"), "val"
    )
