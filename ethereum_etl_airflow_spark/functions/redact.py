"""PII scrubbing for the training-data pipeline: regex redaction of
emails and phone-like spans, with per-document match counts.

The reference pipeline's parse stage already lowercases and
normalizes addresses before publishing (dags/resources/stages/parse/
sqls/parse_logs_udf.sql post-processing); a text corpus needs the
analogous pre-publication scrub. Patterns are written in the common
subset of Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, no backreferences or lookaround — so both engines
match the exact same spans and the driver's value hash verifies the
redacted text byte-for-byte.

Scale notes (100 TB): pure narrow map — regexp_replace/regexp_count
run inside whole-stage codegen on the JVM, no UDF, no shuffle. The
only cost is the regex scan itself, which is linear in corpus bytes
and embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.hashing import phash60, phash60_sql
from ethereum_etl_airflow_spark.queries import _t, register

#: leftmost-longest == leftmost-greedy for these patterns, so Java's
#: backtracking engine and DuckDB's RE2 produce identical spans
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9() -]{6,}[0-9]"

#: the synthetic corpus carries no real PII, so the query plants a
#: deterministic contact line per document before scrubbing — the
#: operator mechanics (match, count, replace) are what's under test
_DIRTY_SQL = (
    "text || ' contact user' || CAST(doc_id AS STRING) || '@example.com'"
    " || ' tel 555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || '99'"
)


@register(
    "text_redact_pii",
    oracle=f"""
    WITH dirty AS (
        SELECT doc_id, source, {_DIRTY_SQL} AS raw FROM documents
    )
    SELECT doc_id, source,
           CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(raw, '{PHONE_RE}')) AS BIGINT) AS n_phone,
           regexp_replace(regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM dirty
    """,
    doc="regex PII redaction (emails, phone-like digit spans) with "
    "per-document match counts; redacted text value-verified",
    survey_ref="training-pipeline ops: pre-publication scrub, the text "
    "analogue of the reference parse stage's address normalization "
    "(parse_logs_udf.sql lowercasing/post-processing)",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One narrow projection: plant the deterministic contact line,
    count matches (``regexp_count``), redact emails then phones
    (order matters — the email local part may contain digits that the
    phone pattern would otherwise nibble). All JVM-side codegen; the
    100 TB plan is scan → project → sink with zero exchanges."""
    d = _t(spark, sf_dir, "documents")
    raw = F.expr(_DIRTY_SQL)
    return d.select(
        "doc_id",
        "source",
        F.regexp_count(raw, F.lit(EMAIL_RE)).cast("long").alias("n_email"),
        F.regexp_count(raw, F.lit(PHONE_RE)).cast("long").alias("n_phone"),
        F.regexp_replace(
            F.regexp_replace(raw, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )


@register(
    "dedup_incremental_newdocs",
    oracle=f"""
    WITH existing AS (
        SELECT {phash60_sql('text')} AS content_fp
        FROM documents WHERE doc_id % 5 != 0
    )
    SELECT doc_id, source, {phash60_sql('text')} AS content_fp
    FROM documents
    WHERE doc_id % 5 = 0
      AND {phash60_sql('text')} NOT IN (SELECT content_fp FROM existing)
    """,
    doc="incremental exact dedup: content fingerprints of an incoming "
    "batch anti-joined against the already-ingested corpus",
    survey_ref="training-pipeline ops over the CDC shape: new feed "
    "batches must dedup against the EXISTING table, not just within "
    "themselves — the per-batch complement of dedup_exact; ref "
    "dags/resources/stages/enrich (dedup on insert) semantics",
)
def dedup_incremental_newdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI hash join on the 60-bit content fingerprint: one
    shuffle of fingerprints only (narrow payload), never the text.
    At 10^10 existing docs the build side is the INCOMING batch
    (small), so AQE flips this to broadcast-anti with the corpus side
    streamed — the scan stays pruned to the fingerprint column. NULL
    discipline: phash60 is never null here, so NOT IN == anti join."""
    d = _t(spark, sf_dir, "documents")
    fp = phash60(F.col("text")).alias("content_fp")
    existing = d.where(F.col("doc_id") % 5 != 0).select(
        phash60(F.col("text")).alias("content_fp")
    )
    incoming = d.where(F.col("doc_id") % 5 == 0).select("doc_id", "source", fp)
    return incoming.join(existing, on="content_fp", how="left_anti").select(
        "doc_id", "source", "content_fp"
    )
