"""Domain-blocklist filtering for crawl ingestion.

Every production crawl pipeline gates documents on a curated domain
blocklist (ad/tracker/spam registrable domains) before any content
processing — it is the cheapest filter in the stack and runs first.
The reference expresses the same shape as a seed-table join gating its
enrich stage (dags/resources/stages/seed + enrich join pattern); here
the seed is the blocklist and the join is a broadcast LEFT join whose
match flag feeds per-source admission counts.

The synthetic corpus has no URL column, so the query plants a
deterministic host per document (three registrable domains cycling on
``doc_id % 5``, same planted-structure trick as
``url_canonical_dedup``), then extracts the registrable domain
(last two labels) with a shared regex and joins it against the
blocklist seed.

Scale notes (100 TB): host planting + domain extraction are narrow
JVM maps. The blocklist is O(10^5) rows in practice — an explicit
``broadcast()`` LEFT join, so the fact side never shuffles for the
join; the only exchange is the final per-source aggregation (20
groups, map-side combine collapses it to ~|sources| rows per task).
One shuffle total, no Python, no skew exposure (the blocklist side is
replicated, hot domains never concentrate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register

#: deterministic planted host: subdomain varies by doc, registrable
#: domain cycles through 5 values, 2 of which are blocklisted
_HOST_SQL = (
    "'cdn' || CAST(doc_id % 3 AS STRING) || '.' || source || '.'"
    " || CASE CAST(doc_id % 5 AS INT)"
    "      WHEN 0 THEN 'spamtracker.net'"
    "      WHEN 1 THEN 'adsnetwork.io'"
    "      WHEN 2 THEN 'example.org'"
    "      WHEN 3 THEN 'research.edu'"
    "      ELSE 'archive.org' END"
)

#: registrable domain = last two dot-labels of the host
_DOMAIN_RE = r"([^.]+\.[^.]+)$"

#: the curated blocklist seed (in production: ~10^5 rows from a file)
BLOCKLIST = ["spamtracker.net", "adsnetwork.io"]


@register(
    "domain_blocklist_filter",
    oracle=f"""
    WITH hosts AS (
        SELECT doc_id, source, {_HOST_SQL} AS host FROM documents
    ),
    doms AS (
        SELECT doc_id, source,
               regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain
        FROM hosts
    ),
    blocklist(domain) AS (VALUES ('spamtracker.net'), ('adsnetwork.io'))
    SELECT d.source,
           CAST(sum(CASE WHEN b.domain IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN b.domain IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_blocked,
           CAST(count(DISTINCT CASE WHEN b.domain IS NOT NULL
                                    THEN d.domain END) AS BIGINT)
               AS n_blocked_domains
    FROM doms d LEFT JOIN blocklist b ON d.domain = b.domain
    GROUP BY d.source
    """,
    doc="broadcast blocklist LEFT join on the registrable domain; "
    "per-source admission counts (kept / blocked / distinct blocked domains)",
    survey_ref="training-pipeline ops: crawl domain blocklist gate; the "
    "reference's seed-table join pattern (stages/seed) with the seed as "
    "the gate",
)
def domain_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow host/domain extraction, explicit ``broadcast()`` of the
    blocklist (LEFT join → match flag), ONE aggregation shuffle."""
    doms = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.regexp_extract(F.expr(_HOST_SQL), _DOMAIN_RE, 1).alias("domain"),
    )
    bl = spark.createDataFrame([(d,) for d in BLOCKLIST], "domain string")
    joined = doms.join(
        F.broadcast(bl.withColumnRenamed("domain", "bl_domain")),
        doms["domain"] == F.col("bl_domain"),
        "left",
    )
    blocked = F.col("bl_domain").isNotNull()
    return joined.groupBy("source").agg(
        F.sum(F.when(~blocked, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(blocked, 1).otherwise(0)).cast("long").alias("n_blocked"),
        F.countDistinct(F.when(blocked, F.col("domain")))
        .cast("long")
        .alias("n_blocked_domains"),
    )
