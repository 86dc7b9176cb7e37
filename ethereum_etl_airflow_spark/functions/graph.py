"""Distributed connected components: near-dup pair graph -> clusters.

Pairwise dedup (``dedup_minhash_lsh`` & friends) emits EDGES; a real
corpus-dedup pipeline must then pick ONE canonical document per
duplicate *cluster* — the transitive closure of the pair relation
(A~B, B~C => keep one of {A,B,C}).  Transitive closure is not a join
chain: duplicate chains have unbounded length, so the operator is an
iterative fixpoint.

This implements the alternating **large-star / small-star** algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — public literature): each round re-points nodes at the
minimum of their neighborhood, provably converging to single-level
stars (every node -> component minimum) in O(log n) rounds.  All
steps are plain DataFrame ops — a groupBy-min and a join per star
step — so Catalyst/AQE handle the physical strategy, and per-round
``localCheckpoint`` truncates the lineage (on a real cluster use a
checkpoint dir; same call shape).

Why not label-propagation-until-stable? Naive propagation needs
O(diameter) rounds — a 10^6-long dup chain (common in boilerplate
crawl data) takes 10^6 shuffles.  Star contraction squares progress
each round: ~20 rounds for 10^6 nodes.

Convergence detection is one scalar aggregate per round (count +
overflow-safe decimal sum of edge hashes) — no edge-set subtract.

Reference parity: the reference dedups only by KEY (ANY_VALUE /
MERGE, amended_tokens.sql:3-10, merge_table.sql:1-15); content-level
cluster dedup is part of the training-data surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.dedup_sql import MINHASH_PAIRS_SQL
from ethereum_etl_airflow_spark.queries import register

MAX_ROUNDS = 64


def _star_round(cur: DataFrame) -> DataFrame:
    """One large-star + small-star pass over the edge set."""
    # large-star: every neighbor v > u re-points at m = min(N(u) + {u})
    sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", F.col("u")).alias("m"))
    )
    large = (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # small-star: orient every edge high->low, then point each smaller
    # neighborhood (and the center) at its minimum
    o = large.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    )
    j = o.join(o.groupBy("u").agg(F.min("v").alias("m")), "u")
    return (
        j.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(j.select("u", "m"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, src: str, dst: str, max_rounds: int = MAX_ROUNDS
) -> DataFrame:
    """(node, cluster) — cluster = minimum node id of each component.

    ``edges`` is an undirected edge list; self-loops are ignored.
    Every node appearing in an edge gets a row.
    """
    # checkpoint the edge set FIRST and derive both the node set and the
    # iteration start from the materialized copy: the upstream pair
    # pipeline (e.g. the full MinHash-LSH join for dedup_cluster_
    # canonical) is often the most expensive part of the whole job, and
    # deriving `nodes` from the lazy frame would silently re-run it a
    # second time when the final labels join evaluates.
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = e.select(F.col("u").alias("node")).union(e.select("v")).distinct()
    cur = e
    prev_sig = None
    for _ in range(max_rounds):
        # lazy checkpoint + signature in ONE job per round: the agg
        # action below materializes the checkpoint (truncating lineage
        # for the next round) while computing the convergence signature.
        # Measured alternative (sf0.1 A/B): fusing TWO star rounds per
        # materialization is ~30% SLOWER — near-dup graphs converge in
        # 1-2 rounds (clusters are shallow), so the fused second round
        # is pure extra compute, not saved scheduling.
        cur = _star_round(cur).localCheckpoint(eager=False)
        sig = tuple(
            cur.agg(
                F.count("*"),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            ).collect()[0]
        )
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # converged: cur holds (node -> component min) stars; roots are
    # absent as sources, so map them to themselves
    labels = cur.groupBy("u").agg(F.min("v").alias("c"))
    return nodes.join(labels, nodes["node"] == labels["u"], "left").select(
        "node", F.coalesce("c", "node").alias("cluster")
    )


@register(
    "dedup_cluster_canonical",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ({MINHASH_PAIRS_SQL})
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, lab) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
    )
    SELECT node AS doc_id, MIN(lab) AS cluster_id,
           (MIN(lab) = node) AS is_canonical
    FROM reach GROUP BY node
    """,
    doc="transitive near-dup clusters over the MinHash pair graph; "
    "cluster id = min doc_id, which is the kept (canonical) copy",
    survey_ref="training-pipeline ops: cluster-level dedup (large-star/"
    "small-star CC, O(log n) rounds) atop dedup_minhash_lsh",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ethereum_etl_airflow_spark.functions.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(pairs, "doc_a", "doc_b")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("cluster").alias("cluster_id"),
        (F.col("cluster") == F.col("node")).alias("is_canonical"),
    )
