"""Skew-salted replicated join: the hot-key join defense, as a
first-class operator.

``agg_salted_hotkeys`` covers salting for AGGREGATION; this covers
the other half of the north rule's "salted hash partitions to defuse
hot-key skew": a fact⋈dim equi-join where a handful of join keys
dominate the fact side, so a plain shuffle join puts entire hot keys
into single tasks. The classic fix when the dim side is too large to
broadcast outright: salt the fact side with ``salt = hash(row) % R``
and replicate each dim row R times (one per salt value), joining on
``(key, salt)`` — every hot key now spreads over R tasks, at the cost
of an R× dim replication (bounded: |dim| × R ≪ |fact|).

The salt NEVER appears in the result: it exists only to refine the
join partitioning, and the semantics are exactly the unsalted join —
which is what the oracle runs (a plain LEFT JOIN), pinning the
equivalence. LEFT semantics survive salting because every (key, salt)
pair for an existing dim key is present on the replicated side.

At this corpus size AQE would broadcast the dim and the salt is
moot — the operator documents and exercises the mechanics (explode-
replicate, composite join key, salt-free output) that apply verbatim
when dim is 100 GB and fact is 100 TB. AQE's own skew-join splitting
(`spark.sql.adaptive.skewJoin`) handles sort-merge skew at runtime;
explicit salting is the deterministic form that also works for
shuffled-hash joins and for writers (the engine's bucketed ingest
uses the same pmod discipline — sinks/snapshot_table.bucket_expr).

Reference parity: the reference's entire partition stage exists for
this (3,999 RANGE_BUCKET hash partitions over the Zipf-hot ERC-20
Transfer topic, build_partition_dag.py:108-140); SURVEY §4 "skew
defense" row. SURVEY §2.3 J2/J6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _dec_sum, _t, register

#: salt fan-out — in production, sized to (hot-key rows / target task
#: size); 4 matches the synthetic corpus's modest skew
_R = 4


@register(
    "join_salted_skew",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    LEFT JOIN customer ON c_custkey = user_id
    GROUP BY c_mktsegment
    """,
    doc="skew-salted fact⋈dim LEFT join: fact salted by "
    "pmod(event_id, R), dim rows replicated once per salt via an "
    "inline explode, join on (key, salt) — hot keys spread over R "
    "tasks; the salt never reaches the output and the oracle runs the "
    "PLAIN join, pinning semantic equivalence",
    survey_ref="build_partition_dag.py:108-140 hash-bucket skew "
    "defense; SURVEY §4 skew row, §2.3 J2/J6; north-rule salted hash "
    "partitions (join form; agg form = agg_salted_hotkeys)",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact side: one narrow map adds the salt. Dim side: sequence+
    explode replicates each row R times (|dim|×R rows — bounded).
    The (key, salt) join then spreads each hot key across R tasks."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "value", F.pmod(F.col("event_id"), _R).alias("_salt")
    )
    dim = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(_R - 1))).alias("_salt")
        )
    )
    joined = ev.join(
        dim,
        (ev.user_id == dim.c_custkey) & (ev._salt == dim._salt),
        "left",
    )
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_events"),
        _dec_sum(F.col("value"), "total_value"),
    )
