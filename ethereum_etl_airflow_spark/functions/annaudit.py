"""ANN quality audit: recall@k of the IVF-probed index against the
exact brute-force baseline — the acceptance gate an approximate index
must pass before it replaces exact search in the dedup/curation
pipeline.

Both sides and the audit itself are derived from the ALREADY-REGISTERED
pipelines (``ann_topk_cosine`` exact, ``ann_ivf_probed`` approximate):
the Spark plan composes the two query functions, and the oracle nests
the two oracle SQLs as CTEs, so the audit can never drift from what the
engines actually compute.

Import-graph rule (veclib.py docstring): the registry lookups are LAZY
— resolved when the query runs / when ``get_oracles()`` is called,
never at module import. A Spark Python worker can import a registration
module (e.g. ``similarity``) first, which imports ``queries``, whose
import block re-enters THIS module while ``similarity`` is still
partially initialized — an import-time ``REGISTRY["ann_topk_cosine"]``
then raises. Deferring the lookup to call time makes registration
order irrelevant (by the time anything RUNS, every module is loaded).

Scale notes: the brute-force side is O(Q*N) — the audit runs on the
query SAMPLE (N_QUERIES rows), exactly how production validates an ANN
index (recall on a sampled query set, never all-pairs). Both inputs end
TOP_K rows per query, so the audit join/agg is Q*K-bounded — driver-
scale, regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.veclib import TOP_K
from ethereum_etl_airflow_spark.queries import REGISTRY, register


def _oracle() -> str:
    bf = REGISTRY["ann_topk_cosine"].oracle
    ivf = REGISTRY["ann_ivf_probed"].oracle
    return f"""
    WITH bf AS ({bf}),
    ivf AS ({ivf})
    SELECT bf.query_id,
           COUNT(ivf.neighbor_id) AS n_hit,
           COUNT(ivf.neighbor_id)::DOUBLE / {TOP_K} AS recall
    FROM bf LEFT JOIN ivf
      ON ivf.query_id = bf.query_id AND ivf.neighbor_id = bf.neighbor_id
    GROUP BY bf.query_id
    """


@register(
    "ann_recall_audit",
    oracle=_oracle,
    doc=f"recall@{TOP_K} of the IVF-probed ANN index vs the exact "
    "brute-force top-k, per query — the index acceptance gate",
    survey_ref="training-pipeline ops: ANN quality audit composing "
    "ann_topk_cosine (exact) with ann_ivf_probed (approximate)",
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = REGISTRY["ann_topk_cosine"].spark_fn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ivf = (
        REGISTRY["ann_ivf_probed"]
        .spark_fn(spark, sf_dir)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    return (
        bf.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hit"),
            (F.count("hit").cast("double") / TOP_K).alias("recall"),
        )
    )
