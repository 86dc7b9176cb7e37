"""URL canonicalization + URL-level dedup for the training-data
pipeline (the "same page fetched under many URL spellings" problem).

Web-crawl corpora carry the same page under scheme/case variants,
``www.`` prefixes, default ports, tracking parameters (``utm_*``),
trailing slashes, and fragments. Canonicalizing before dedup is the
standard first pass (done URL-side, far cheaper than content dedup).
The reference's parse stage performs the analogous normalization on
addresses before grouping (dags/resources/stages/parse/sqls/
parse_logs_udf.sql lowercasing/post-processing); this module applies
the same discipline to URLs.

The synthetic corpus has no URL column, so the query plants a
deterministic messy URL per document (four spelling variants that
must collapse to two canonical forms) — the operator mechanics
(parse, normalize, strip, re-group) are what's under test, mirroring
``text_redact_pii``'s planted-contact-line pattern.

All regex stays in the Java-regex∩RE2 common subset (anchored
patterns, character classes; no lookaround/backrefs), and every
anchored replace matches at most once so Spark's replace-all and
DuckDB's replace-first agree byte-for-byte.

Scale notes (100 TB): canonicalization is a pure narrow map (JVM
codegen, zero exchanges); the dedup is ONE hash aggregation on the
canonical string with map-side partial combine. Canonical-URL keys
are near-unique, so the shuffle is ~|distinct pages| and skew-free —
this is the cheapest dedup tier, run before any content-based pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register

#: deterministic messy URL: 4 spelling variants that canonicalize down
#: to 2 forms — ?utm_*&page=2 and /?page=2 collapse together; #fragment
#: and bare collapse together. The variant selector floor((doc_id%80)/20)
#: cycles within a source (source is doc_id%20 in the synthetic corpus)
#: and the 7-way path modulus forces real duplicate groups; floor()
#: keeps the double→int conversion identical across engines (DuckDB
#: CAST rounds, Spark truncates — floor sidesteps both).
_URL_SQL = (
    "'HTTPS://WWW.' || upper(source) || '.Example.COM:443/docs/'"
    " || CAST(doc_id % 7 AS STRING)"
    " || CASE CAST(floor((doc_id % 80) / 20.0) AS INT)"
    "      WHEN 0 THEN '?utm_source=feed&utm_campaign=x&page=2'"
    "      WHEN 1 THEN '/?page=2'"
    "      WHEN 2 THEN '#section-3'"
    "      ELSE '' END"
)

#: canonicalization pipeline over a column named url (Spark SQL side).
#: host: lowercase, strip :port, strip leading www.
_HOST_SQL = (
    "regexp_replace(regexp_replace(lower("
    "regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)"
    "), ':[0-9]+$', ''), '^www\\\\.', '')"
)
#: path: everything between host and ?/#, trailing slashes stripped
_PATH_SQL = (
    "regexp_replace("
    "regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/+$', '')"
)
#: query string with tracking params dropped, original order kept
_QS_SQL = (
    "array_join(filter(split(regexp_extract(url, '\\\\?([^#]*)', 1), '&'),"
    " x -> substr(x, 1, 4) != 'utm_' AND x != ''), '&')"
)


@register(
    "url_canonical_dedup",
    oracle=f"""
    WITH withurl AS (
        SELECT doc_id, source, {_URL_SQL} AS url FROM documents
    ),
    canon AS (
        SELECT doc_id, source,
               regexp_replace(regexp_replace(lower(
                   regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)
               ), ':[0-9]+$', ''), '^www\\.', '') AS host,
               regexp_replace(
                   regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                   '/+$', '') AS path,
               array_to_string(list_filter(
                   string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                   x -> substr(x, 1, 4) != 'utm_' AND x != ''), '&') AS qs
        FROM withurl
    )
    SELECT 'https://' || host || path
               || CASE WHEN qs != '' THEN '?' || qs ELSE '' END AS canonical_url,
           host,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id
    FROM canon
    GROUP BY 1, 2
    """,
    doc="URL canonicalization (case, www., default port, utm_* params, "
    "trailing slash, fragment) + one-hash-agg dedup by canonical URL",
    survey_ref="training-pipeline ops: URL-level crawl dedup; the URL "
    "analogue of the reference parse stage's address normalization "
    "(parse_logs_udf.sql) before grouping",
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow map (plant URL → extract host/path/query → normalize)
    followed by ONE groupBy on the canonical string. Everything before
    the agg is whole-stage-codegen JVM regex/string ops — no UDF; the
    higher-order ``filter`` lambda for utm-stripping also runs JVM-side.
    At 10^10 URLs the canonical key is near-unique → uniform shuffle;
    map-side combine collapses in-partition duplicates first."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_URL_SQL).alias("url")
    )
    canon = d.select(
        "doc_id",
        F.expr(_HOST_SQL).alias("host"),
        F.expr(_PATH_SQL).alias("path"),
        F.expr(_QS_SQL).alias("qs"),
    ).select(
        "doc_id",
        "host",
        F.concat(
            F.lit("https://"),
            F.col("host"),
            F.col("path"),
            F.when(F.col("qs") != "", F.concat(F.lit("?"), F.col("qs"))).otherwise(
                F.lit("")
            ),
        ).alias("canonical_url"),
    )
    return canon.groupBy("canonical_url", "host").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("keep_doc_id"),
    )
