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
from ethereum_etl_airflow_spark.queries import _t, register

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


# --- link-authority power iteration -----------------------------------------

#: fixed-point unit for rank mass. Overflow bound: a node's inflow is
#: at most (#source nodes) * _PR_SCALE, and the final 85x multiply
#: must stay under 2^63 -> safe to ~10^8 source nodes per graph at
#: this scale; widen to DECIMAL(38,0) beyond (same values, no wrap).
_PR_SCALE = 1_000_000_000


def pagerank_step(edges: DataFrame, ranks: DataFrame) -> DataFrame:
    """One PageRank power-iteration step over (src, dst) edges with
    integer rank mass: new_rank(v) = 0.15*S + 0.85 * sum over in-edges
    of rank(u) DIV outdeg(u), all in exact int64 (floor division loses
    < outdeg units of mass per node per round — irrelevant for ranking,
    and bit-identical across engines, unlike float sums whose order
    Spark does not fix).

    Scale shape: outdeg is a map-side-combined agg on src; the
    contribution join shuffles edges once on src; inflow aggregates on
    dst. Iterate by looping this step with ``localCheckpoint`` every
    round (the connected_components pattern above); each round is the
    same 2-shuffle plan, so K iterations cost exactly K * one-step.
    Dangling nodes (no out-edges) keep their mass out of circulation —
    the standard sink-handling trick (redistribute a global dangling
    sum, one broadcast scalar per round) drops in without changing the
    plan shape.
    """
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    r = ranks.withColumnRenamed("node", "src").withColumnRenamed(
        "rank_s", "src_rank"
    )
    inflow = (
        edges.join(outdeg, "src")
        .join(r, "src")
        .select("dst", F.expr("src_rank DIV deg").alias("contrib"))
        .groupBy("dst")
        .agg(F.sum("contrib").alias("inflow"))
    )
    all_nodes = edges.select(F.col("src").alias("node")).union(
        edges.select("dst")
    ).distinct()
    return all_nodes.join(
        inflow, all_nodes["node"] == inflow["dst"], "left"
    ).select(
        "node",
        (
            F.lit(15 * _PR_SCALE // 100)
            + F.expr(f"85 * coalesce(inflow, 0L) DIV 100")
        ).alias("rank_s"),
    )


@register(
    "pagerank_iteration",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), outdeg AS (
        SELECT src, COUNT(*)::BIGINT AS deg FROM edges GROUP BY src
    ), nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), inflow1 AS (
        SELECT e.dst, SUM({_PR_SCALE} // d.deg)::BIGINT AS inflow
        FROM edges e JOIN outdeg d USING (src) GROUP BY e.dst
    ), r1 AS (
        SELECT n.node,
               ({15 * _PR_SCALE // 100} + 85 * COALESCE(i.inflow, 0) // 100)
                   ::BIGINT AS rank_s
        FROM nodes n LEFT JOIN inflow1 i ON i.dst = n.node
    ), inflow2 AS (
        SELECT e.dst, SUM(r.rank_s // d.deg)::BIGINT AS inflow
        FROM edges e JOIN outdeg d USING (src)
        JOIN r1 r ON r.node = e.src
        GROUP BY e.dst
    )
    SELECT n.node,
           ({15 * _PR_SCALE // 100} + 85 * COALESCE(i.inflow, 0) // 100)
               ::BIGINT AS rank_s
    FROM nodes n LEFT JOIN inflow2 i ON i.dst = n.node
    ORDER BY rank_s DESC, node ASC
    LIMIT 50
    """,
    doc="two PageRank power-iteration steps over the customer->supplier "
    "order graph in exact integer rank mass (no float sums, no ln) — "
    "top-50 authority nodes; the domain-authority signal web-corpus "
    "curation ranks crawl sources by",
    survey_ref="training-pipeline ops (link-authority corpus weighting); "
    "iterative-fixpoint sibling of connected_components (SoCC'14 star "
    "contraction above)",
)
def pagerank_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edges = distinct customer->supplier pairs through orders x
    lineitem (the graph the synthetic schema actually contains). Two
    full power steps: uniform init (rank = S), step, step — enough to
    pin the iteration machinery end-to-end; production runs loop
    ``pagerank_step`` to tolerance with localCheckpoint per round."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    # checkpoint the loop-invariant edge set and each round's ranks —
    # without it the unrolled 2-step logical plan recomputes the edge
    # join ~20x (measured); with it, each step is the designed
    # 2-shuffle plan over the materialized edges (exactly how the CC
    # fixpoint above iterates)
    edges = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select("dst")
    ).distinct()
    r0 = nodes.select("node", F.lit(_PR_SCALE).cast("long").alias("rank_s"))
    r1 = pagerank_step(edges, r0).localCheckpoint(eager=False)
    r2 = pagerank_step(edges, r1)
    return r2.orderBy(F.desc("rank_s"), F.asc("node")).limit(50)


# ---------------------------------------------------------------------------
# Degree-ordered triangle counting (Suri & Vassilvitskii, "Counting
# Triangles and the Curse of the Last Reducer", WWW'11 — public
# literature). Triangle density is the standard cohesion probe for
# similarity/co-occurrence graphs (how clique-ish are the near-dup
# families? is the co-occurrence graph one blob or communities?).
#
# The naive wedge join explodes on hubs: a degree-d node contributes
# d^2 wedges. Orienting every edge from the LOWER-degree endpoint to
# the higher (ties by id) caps out-degree at O(sqrt(|E|)) for ANY
# degree distribution — the worst reducer handles sqrt(|E|)^2 = |E|
# wedges instead of d_max^2. Each triangle is counted exactly once
# (its unique degree-ordering orientation is acyclic).
# ---------------------------------------------------------------------------


@register(
    "graph_triangle_count",
    oracle="""
    WITH cells AS (
        SELECT DISTINCT user_id,
               event_type, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ), adj AS (
        SELECT user_id AS u,
               LEAD(user_id) OVER (
                   PARTITION BY event_type, d ORDER BY user_id
               ) AS v
        FROM cells
    ), edges AS (
        SELECT DISTINCT u, v FROM adj WHERE v IS NOT NULL
    ), deg AS (
        SELECT u AS node, COUNT(*) AS deg FROM (
            SELECT u FROM edges UNION ALL SELECT v FROM edges
        ) t(u) GROUP BY u
    ), oriented AS (
        SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS s,
               CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS t
        FROM edges e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
    ), wedges AS (
        SELECT a.s AS x, a.t AS y, b.t AS z
        FROM oriented a JOIN oriented b ON a.s = b.s AND a.t < b.t
    )
    SELECT (SELECT COUNT(*) FROM edges)::BIGINT AS n_edges,
           (SELECT COUNT(*) FROM wedges)::BIGINT AS n_wedges,
           (SELECT COUNT(*) FROM wedges w
             WHERE EXISTS (SELECT 1 FROM oriented o
                           WHERE (o.s = w.y AND o.t = w.z)
                              OR (o.s = w.z AND o.t = w.y)))::BIGINT
               AS n_triangles
    """,
    doc="degree-ordered triangle count on the user co-occurrence graph. "
    "Cells are encoded as adjacency PATHS (consecutive users within a "
    "(event_type, day) cell), never cliques — a k-user cell emits k-1 "
    "edges, not k^2/2, so the edge list stays linear in the input; "
    "low->high-degree orientation then caps out-degree at O(sqrt(|E|)) "
    "so no reducer sees a hub's d^2 wedges",
    survey_ref="graph analytics over the similarity/co-occurrence "
    "surfaces (cluster sibling dedup_cluster_canonical, rank sibling "
    "pagerank_iteration); Suri & Vassilvitskii WWW'11",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: cell distinct (1 shuffle), per-cell lead() window sharing
    that partitioning (path edges — k-1 per k-user cell, never the
    clique's k^2/2), pair distinct, degree agg over the symmetrized
    edge list, orientation as a projection, wedge self-join on the
    oriented source, and a closing-edge probe. Every join key is a
    node id with orientation-capped fan-out."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    cells = ev.select(
        "user_id",
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).distinct()
    wadj = W.partitionBy("event_type", "d").orderBy("user_id")
    # edges and the oriented list are each referenced by several
    # downstream branches; localCheckpoint makes them plan leaves so
    # Catalyst doesn't re-expand the whole subtree per reference (the
    # connected_components discipline — on a cluster, checkpoint dir)
    edges = (
        cells.select(
            F.col("user_id").alias("u"),
            F.lead("user_id").over(wadj).alias("v"),
        )
        .where(F.col("v").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    sym = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count("*").alias("deg"))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
        .localCheckpoint()
    )
    oa = oriented.alias("oa")
    ob = oriented.alias("ob")
    # a.t < b.t makes (y, z) already id-canonical within each wedge
    wedges = oa.join(
        ob,
        (F.col("oa.s") == F.col("ob.s")) & (F.col("oa.t") < F.col("ob.t")),
    ).select(F.col("oa.t").alias("y"), F.col("ob.t").alias("z"))
    # closing edge may be oriented either way between y and z;
    # LEFT join + flag folds wedge and triangle counts into ONE agg
    # (cy, cz) is unique: edges are distinct u<v pairs and orientation
    # is a bijection on them — the LEFT join cannot fan out
    closing = oriented.select(
        F.least("s", "t").alias("cy"), F.greatest("s", "t").alias("cz")
    )
    flagged = wedges.join(
        closing,
        (F.col("y") == F.col("cy")) & (F.col("z") == F.col("cz")),
        "left",
    )
    counts = flagged.agg(
        F.count("*").cast("long").alias("n_wedges"),
        F.sum(F.col("cy").isNotNull().cast("int")).cast("long").alias(
            "n_triangles"
        ),
    )
    n_edges = edges.agg(F.count("*").cast("long").alias("n_edges"))
    return n_edges.crossJoin(counts).select(
        "n_edges", "n_wedges", "n_triangles"
    )


@register(
    "graph_label_prop_step",
    oracle="""
    WITH cells AS (
        SELECT DISTINCT user_id,
               event_type, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ), adj AS (
        SELECT user_id AS u,
               LEAD(user_id) OVER (
                   PARTITION BY event_type, d ORDER BY user_id
               ) AS v
        FROM cells
    ), edges AS (
        SELECT DISTINCT u, v FROM adj WHERE v IS NOT NULL
    ), sym AS (
        SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ), votes AS (
        SELECT u AS node, v % 4 AS lbl, COUNT(*)::BIGINT AS cnt
        FROM sym GROUP BY 1, 2
    ), ranked AS (
        SELECT node, lbl, cnt,
               ROW_NUMBER() OVER (
                   PARTITION BY node ORDER BY cnt DESC, lbl ASC
               ) AS rn
        FROM votes
    )
    SELECT node, lbl::BIGINT AS new_label, cnt AS votes
    FROM ranked WHERE rn = 1
    """,
    doc="one label-propagation step (Raghavan et al. 2007) on the "
    "co-occurrence graph: each node adopts the most frequent label "
    "among its neighbors (ties -> smallest label), seed labels = "
    "node id mod 4 so the step is closed-form checkable; the same "
    "path-encoded edge set as graph_triangle_count, so the edge list "
    "stays linear in the input",
    survey_ref="graph family third primitive (components = "
    "dedup_cluster_canonical, rank = pagerank_iteration, communities "
    "= this); one iteration = the fixpoint loop body, same per-step "
    "plan the connected-components driver runs",
)
def graph_label_prop_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Votes = symmetrized-edge groupBy (ONE corpus-sized exchange on
    the node; the neighbor's seed label is ARITHMETIC — v % 4 — so no
    label-table join exists to shuffle); the argmax window shares the
    node partitioning, so Catalyst reuses the exchange. At 10^9 edges
    each LP iteration is exactly one shuffle."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    cells = ev.select(
        "user_id",
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).distinct()
    wadj = W.partitionBy("event_type", "d").orderBy("user_id")
    # edges feeds both union branches; checkpoint it so the cells
    # subtree computes once (the graph_triangle_count discipline)
    edges = (
        cells.select(
            F.col("user_id").alias("u"),
            F.lead("user_id").over(wadj).alias("v"),
        )
        .where(F.col("v").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    votes = sym.groupBy(
        F.col("u").alias("node"), (F.col("v") % 4).alias("lbl")
    ).agg(F.count("*").alias("cnt"))
    ranked = votes.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("node").orderBy(F.desc("cnt"), F.asc("lbl"))
        ),
    )
    return ranked.where(F.col("rn") == 1).select(
        "node",
        F.col("lbl").cast("long").alias("new_label"),
        F.col("cnt").alias("votes"),
    )
