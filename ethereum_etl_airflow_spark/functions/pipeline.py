"""End-to-end corpus build: the full training-data pipeline as ONE
composable, oracle-checked DAG.

Every stage reuses a primitive that already exists as a standalone
operator — this query is the proof that they COMPOSE into the
pipeline a real user would run nightly over a 100 TB crawl:

    exact dedup  →  language filter  →  quality gate  →
    stable split assignment  →  per-split sequence packing  →  audit

The reference chains its stages the same way (export → load → enrich
→ parse → verify, one Airflow DAG per table family,
dags/export_dag.py + build_load_dag.py + build_parse_dag.py); here
the chain is a single declarative Spark plan, so Catalyst fuses the
narrow stages (language filter, quality gate, split assignment are
ONE codegen'd map over the scan) and the only exchanges are the two
the algorithm genuinely needs: the fingerprint window for dedup and
the per-split block window for packing.

Scale notes (100 TB):
* dedup = one hash-partitioned window on the 60-bit content
  fingerprint (near-unique keys, skew-free);
* all filters are narrow and run fused in whole-stage codegen;
* packing uses the two-phase distributed prefix sum (per-block
  partials → bounded driver cumsum → broadcast back), partitioned by
  split — no single-partition global window ever materializes;
* the driver-side cumsum is bounded at |splits| × |blocks| entries
  (3 × 10^4 at 10^10 docs with 10^6-doc blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ethereum_etl_airflow_spark.functions.hashing import phash60, phash60_sql
from ethereum_etl_airflow_spark.queries import _t, register

#: context-window length (tokens) — same packing constant as
#: corpus_pack_sequences (re-declared: registration modules never
#: import names from each other at top level)
PIPE_MAX_LEN = 512
#: documents per prefix-sum block
PIPE_BLOCK = 100

_FP = phash60_sql("text")
_SPLIT_HASH = phash60_sql("CAST(doc_id AS VARCHAR)")


@register(
    "corpus_build_pipeline",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, lang, text, string_split(text, ' ') AS toks,
               {_FP} AS fp
        FROM documents
    ),
    dedup AS (
        SELECT * FROM (
            SELECT doc_id, lang, toks,
                   MIN(doc_id) OVER (PARTITION BY fp) AS keep_id
            FROM base
        ) WHERE doc_id = keep_id
    ),
    gated AS (
        SELECT doc_id, len(toks) AS n_tok
        FROM (
            SELECT doc_id, toks,
                   len(toks) AS n_tok,
                   len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) AS n_stop,
                   len(list_filter(toks, x -> len(x) <= 2)) AS n_short
            FROM dedup WHERE lang = 'en'
        )
        WHERE n_tok BETWEEN 50 AND 100000
          AND n_stop::DOUBLE / n_tok BETWEEN 0.01 AND 0.5
          AND n_short::DOUBLE / n_tok < 0.3
    ),
    assigned AS (
        SELECT doc_id, n_tok,
               CASE WHEN {_SPLIT_HASH} % 100 < 80 THEN 'train'
                    WHEN {_SPLIT_HASH} % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM gated
    ),
    packed AS (
        SELECT split, doc_id, n_tok,
               SUM(n_tok) OVER (PARTITION BY split ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok AS start
        FROM assigned
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT start // {PIPE_MAX_LEN}) AS BIGINT) AS n_seqs
    FROM packed GROUP BY split
    """,
    doc="end-to-end corpus build: exact dedup -> language filter -> "
    "quality gate -> stable hash split -> per-split sequence packing, "
    "audited per split — the standalone operators composed into one DAG",
    survey_ref="the reference's export->load->parse->verify DAG chain "
    "(dags/export_dag.py, build_load_dag.py, build_parse_dag.py) as a "
    "single declarative Spark plan over the training-data surface",
)
def corpus_build_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two genuine exchanges end to end: the fingerprint window (dedup)
    and the (split, block) window (packing); everything between them is
    fused narrow codegen. The prefix sum is the bounded two-phase scan,
    partitioned by split."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    # stage 1: exact dedup — keep the minimum doc_id per content print
    fp_w = W.partitionBy("fp")
    deduped = (
        d.select("doc_id", "lang", toks.alias("toks"), phash60(F.col("text")).alias("fp"))
        .withColumn("keep_id", F.min("doc_id").over(fp_w))
        .where(F.col("doc_id") == F.col("keep_id"))
    )

    # stages 2+3: language filter + C4-style quality gate (one fused map)
    stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to")])
    n_tok = F.size("toks")
    n_stop = F.size(F.filter("toks", lambda x: F.array_contains(stop, x)))
    n_short = F.size(F.filter("toks", lambda x: F.length(x) <= 2))
    gated = (
        deduped.where(F.col("lang") == "en")
        .select("doc_id", n_tok.alias("n_tok"), n_stop.alias("n_stop"), n_short.alias("n_short"))
        .where(
            F.col("n_tok").between(50, 100_000)
            & (F.col("n_stop").cast("double") / F.col("n_tok")).between(0.01, 0.5)
            & ((F.col("n_short").cast("double") / F.col("n_tok")) < 0.3)
        )
    )

    # stage 4: stable content-independent split assignment (narrow)
    bucket = phash60(F.col("doc_id").cast("string")) % 100
    assigned = gated.select(
        "doc_id",
        "n_tok",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )

    # stage 5: per-split two-phase prefix sum -> context-window ids
    blocked = assigned.withColumn("_blk", F.expr(f"doc_id div {PIPE_BLOCK}"))
    partials = blocked.groupBy("split", "_blk").agg(F.sum("n_tok").alias("_bsum")).collect()
    offsets, acc = [], {}
    for r in sorted(partials, key=lambda r: (r["split"], r["_blk"])):
        offsets.append((r["split"], r["_blk"], acc.get(r["split"], 0)))
        acc[r["split"]] = acc.get(r["split"], 0) + r["_bsum"]
    off_df = spark.createDataFrame(offsets, "split string, _blk long, _boff long")
    w = (
        W.partitionBy("split", "_blk")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = blocked.join(F.broadcast(off_df), ["split", "_blk"]).withColumn(
        "start",
        (F.sum("n_tok").over(w) - F.col("n_tok") + F.col("_boff")).cast("long"),
    )

    # stage 6: per-split audit
    return packed.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.countDistinct(F.expr(f"start div {PIPE_MAX_LEN}")).cast("long").alias("n_seqs"),
    )
