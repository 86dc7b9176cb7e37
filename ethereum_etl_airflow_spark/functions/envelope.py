"""Change-envelope parsing: binlog/WAL-style JSON change envelopes
(the Debezium/CDC wire shape: ``{"op": ..., "after": {...}, "seq":
...}``) parsed into typed change rows and folded last-writer-wins.

The reference ingests its change feed as *typed exports* (ethereum-etl
CSVs loaded by build_load_dag.py) and separately parses *hex-encoded
log payloads* (dags/resources/stages/parse); real CDC sources sit in
between — a self-describing JSON envelope per change event.  This
module closes that gap Spark-first:

* the decode is JVM-side ``from_json`` (whole-stage codegen, no
  Python in the hot path — the same discipline as the hex decoder's
  Arrow kernels, but here the built-in is enough);
* malformed envelopes decode to NULL structs (from_json's PERMISSIVE
  default), the same null-on-failure contract as the reference's JS
  log-parse UDF (parse_logs_udf.sql: returns null on decode error) —
  downstream the quarantine operator picks them up;
* the LWW fold is ONE hash aggregate (``max_by(op, seq)``) — a single
  shuffle with map-side combine, the same arg-max shape the CDC core
  uses, so it scales like any groupBy at 10^10 events;
* the payload schema audit reads the key-set of every envelope
  (``json_object_keys``) and aggregates occurrence spans per shape —
  the observability query you run when an upstream producer starts
  emitting a new column mid-stream (schema drift detection for the
  evolution path apply_changes already handles).

Envelopes are PLANTED deterministically from the events table (the
planted-line pattern used by text_redact_pii / url_canonical_dedup):
both engines build byte-identical JSON from the same parquet rows,
then each parses its own — so the comparison checks the *parse +
fold* semantics, not string luck.  Doubles ride through the envelope
via each engine's round-trippable double->string cast, so the parsed
value is bit-equal to the source column in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _dec_sum, _t, register

#: event_type -> envelope op code (Debezium letters: c=create, u=update,
#: d=delete).  Only these three types become change events; the rest of
#: the feed is other telemetry.
OP_MAP = {"purchase": "c", "click": "u", "error": "d"}

#: from_json schema for the planted envelope (value is optional — only
#: create envelopes carry it, so update/delete rows decode it as NULL)
ENVELOPE_SCHEMA = "op string, after struct<key: bigint, seq: bigint, value: double>"


def build_envelopes(events: DataFrame) -> DataFrame:
    """events rows -> one JSON change envelope per row (deterministic
    plant; ``value`` present only on create envelopes so the corpus
    carries TWO payload shapes for the schema audit)."""
    op = (
        F.when(F.col("event_type") == "purchase", F.lit("c"))
        .when(F.col("event_type") == "click", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    return events.where(F.col("event_type").isin(*OP_MAP)).select(
        F.concat(
            F.lit('{"op":"'),
            op,
            F.lit('","after":{"key":'),
            F.col("user_id").cast("string"),
            F.lit(',"seq":'),
            F.col("event_id").cast("string"),
            F.when(
                F.col("event_type") == "purchase",
                F.concat(F.lit(',"value":'), F.col("value").cast("string")),
            ).otherwise(F.lit("")),
            F.lit("}}"),
        ).alias("envelope")
    )


def parse_envelopes(env: DataFrame) -> DataFrame:
    """JSON envelope column -> typed change rows (op, key, seq, val).
    Pure JVM from_json — stays inside whole-stage codegen."""
    return env.select(F.from_json("envelope", ENVELOPE_SCHEMA).alias("j")).select(
        F.col("j.op").alias("op"),
        F.col("j.after.key").alias("key"),
        F.col("j.after.seq").alias("seq"),
        F.col("j.after.value").alias("val"),
    )


@register(
    "cdc_envelope_parse",
    oracle="""
    WITH env AS (
        SELECT '{"op":"'
               || CASE event_type WHEN 'purchase' THEN 'c'
                                  WHEN 'click' THEN 'u'
                                  ELSE 'd' END
               || '","after":{"key":' || user_id || ',"seq":' || event_id
               || CASE WHEN event_type = 'purchase'
                       THEN ',"value":' || CAST(value AS VARCHAR)
                       ELSE '' END
               || '}}' AS envelope
        FROM events
        WHERE event_type IN ('purchase', 'click', 'error')
    ), p AS (
        SELECT json_extract_string(envelope, '$.op') AS op,
               CAST(json_extract(envelope, '$.after.key') AS BIGINT) AS key,
               CAST(json_extract(envelope, '$.after.seq') AS BIGINT) AS seq,
               CAST(json_extract(envelope, '$.after.value') AS DOUBLE) AS val
        FROM env
    )
    SELECT key,
           arg_max(op, seq) AS last_op,
           MAX(seq) AS last_seq,
           COUNT(*)::BIGINT AS n_changes,
           CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM p
    GROUP BY key
    HAVING arg_max(op, seq) <> 'd'
    """,
    doc="WAL/binlog JSON envelope ingest: JVM from_json decode -> "
    "single-shuffle arg-max LWW fold -> live keys (final op != delete); "
    "the self-describing-feed front door to the CDC core",
    survey_ref="S13 keyed delete-insert + M2 MERGE (ref build_load_dag.py "
    "merge path); §2.8 JSON (parse_logs_udf.sql null-on-failure contract)",
)
def cdc_envelope_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = parse_envelopes(build_envelopes(_t(spark, sf_dir, "events")))
    return (
        p.groupBy("key")
        .agg(
            F.expr("max_by(op, seq)").alias("last_op"),
            F.max("seq").alias("last_seq"),
            F.count(F.lit(1)).alias("n_changes"),
            _dec_sum(F.col("val"), "sum_value"),
        )
        .where(F.col("last_op") != "d")
    )


@register(
    "cdc_envelope_schema_audit",
    oracle="""
    WITH env AS (
        SELECT '{"op":"'
               || CASE event_type WHEN 'purchase' THEN 'c'
                                  WHEN 'click' THEN 'u'
                                  ELSE 'd' END
               || '","after":{"key":' || user_id || ',"seq":' || event_id
               || CASE WHEN event_type = 'purchase'
                       THEN ',"value":' || CAST(value AS VARCHAR)
                       ELSE '' END
               || '}}' AS envelope
        FROM events
        WHERE event_type IN ('purchase', 'click', 'error')
    ), shapes AS (
        SELECT json_extract_string(envelope, '$.op') AS op,
               array_to_string(list_sort(json_keys(envelope, '$.after')), ',')
                   AS schema_sig,
               CAST(json_extract(envelope, '$.after.seq') AS BIGINT) AS seq
        FROM env
    )
    SELECT op, schema_sig,
           COUNT(*)::BIGINT AS n_events,
           MIN(seq) AS first_seq,
           MAX(seq) AS last_seq
    FROM shapes
    GROUP BY op, schema_sig
    """,
    doc="payload schema-drift audit: key-set signature of every envelope "
    "(json_object_keys), occurrence span per (op, shape) — flags an "
    "upstream producer adding/dropping columns mid-stream before the "
    "evolution path has to absorb it",
    survey_ref="§2.10 schema evolution (SURVEY: added columns mid-feed); "
    "ref load tolerance build_load_dag.py allow_quoted_newlines etc.",
)
def cdc_envelope_schema_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = build_envelopes(_t(spark, sf_dir, "events"))
    shapes = env.select(
        F.get_json_object("envelope", "$.op").alias("op"),
        F.array_join(
            F.array_sort(
                F.json_object_keys(F.get_json_object("envelope", "$.after"))
            ),
            ",",
        ).alias("schema_sig"),
        F.get_json_object("envelope", "$.after.seq").cast("bigint").alias("seq"),
    )
    return shapes.groupBy("op", "schema_sig").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("seq").alias("first_seq"),
        F.max("seq").alias("last_seq"),
    )
