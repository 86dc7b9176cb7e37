"""Deduplication operators for the training-data pipeline: exact
hash-dedup, n-gram Jaccard near-dup, MinHash+LSH near-dup.

The reference's dedup surface is key-level (``ANY_VALUE`` first-wins,
amended_tokens.sql:3-10; MERGE delete-insert, merge_table.sql:1-15).
A training corpus additionally needs CONTENT-level dedup; these
operators provide it Spark-first:

* exact: one hash aggregation on a content fingerprint — map-side
  combine, one shuffle of (fingerprint, doc_id) pairs only.
* n-gram Jaccard: shingle -> explode -> self-join on shared shingle
  (blocking — the cross-join never materializes; candidate generation
  is |pairs sharing a shingle|, not |docs|^2) -> exact Jaccard on
  distinct-shingle arrays.
* MinHash+LSH: K=16 portable permutations folded per doc (no explode
  for signature build — one pass over the shingle array), banded
  4x4; only band-bucket collisions become candidates (the classic
  LSH S-curve); candidates verified with exact Jaccard. At 100 TB
  the band join is the only shuffle and its keys are ~uniform by
  construction (hash buckets), sidestepping skew.

Every query is value-checked against a DuckDB oracle built from the
same portable md5 hashing (functions/hashing.py) — bit-identical
signatures in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.dedup_sql import (  # noqa: F401
    JACCARD_THRESHOLD,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    MINHASH_PAIRS_SQL,
    _SHINGLES_SQL,
    _sig_sql,
    incremental_lsh_sql,
)
from ethereum_etl_airflow_spark.functions.hashing import (
    MINHASH_P,
    minhash_perm_sql,
    phash60,
    phash60_sql,
)
from ethereum_etl_airflow_spark.queries import _t, register


def shingles_col(toks):
    """Distinct 3-gram token shingles of a token array (w-shingling)."""
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(2)),
        lambda i: F.array_join(F.slice(toks, i, 3), " "),
    )
    return F.when(n >= 3, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


@register(
    "dedup_exact",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {phash60_sql("array_to_string((string_split(text, ' '))[1:3], ' ')")} AS fp
        FROM documents
    )
    SELECT fp, MIN(doc_id) AS keeper, COUNT(*) AS group_size
    FROM t GROUP BY fp HAVING COUNT(*) > 1
    """,
    doc="exact dedup: hash-groupBy on content fingerprint, keep min doc_id",
    survey_ref="amended_tokens.sql:3-10 (A2 dedup generalized to content hash)",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint (here: 3-token prefix, the
    blocking key with actual collisions in the synthetic corpus; for
    full-content dedup swap in md5(text) — identical plan shape).
    ONE hash aggregation: map-side combine collapses dup groups before
    the shuffle; only (fp, doc_id) pairs move."""
    d = _t(spark, sf_dir, "documents")
    fp = phash60(F.array_join(F.slice(F.split("text", " "), 1, 3), " "))
    return (
        d.select(fp.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("group_size"))
        .where(F.col("group_size") > 1)
    )


#: stop-shingle document-frequency cap for candidate generation: a
#: shingle appearing in more than this many docs is dropped from the
#: blocking join (its df^2 pair blow-up is the classic zipfian
#: scale-killer). Far above any plausible df in the test corpora
#: (max observed ~25), so small-SF results are byte-identical; at 10^9
#: docs this is what keeps the join from going quadratic on 'the'.
SHINGLE_DF_CAP = 100_000


def _jaccard_candidates(sh: DataFrame, order: str) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs under the chosen global shingle
    order (see dedup_ngram_jaccard docstring for the lex/df tradeoff)."""
    n = F.size("sh")
    prefix_len = (n - F.floor(F.lit(JACCARD_THRESHOLD) * n) + 1).cast("int")
    if order == "df":
        ex = sh.select("doc_id", F.explode("sh").alias("g"))
        df_tbl = ex.groupBy("g").agg(F.count("*").alias("df"))
        ranked = (
            ex.join(df_tbl, "g")
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_list(F.struct("df", "g"))).alias("rk"))
        )
        plen = (
            F.size("rk") - F.floor(F.lit(JACCARD_THRESHOLD) * F.size("rk")) + 1
        ).cast("int")
        pref = ranked.select(
            "doc_id",
            F.explode(F.transform(F.slice("rk", 1, plen), lambda s: s["g"])).alias("g"),
        )
        live = pref.join(df_tbl.where(F.col("df") <= SHINGLE_DF_CAP).drop("df"), "g")
    else:
        pref = sh.select(
            "doc_id", F.explode(F.slice(F.array_sort("sh"), 1, prefix_len)).alias("g")
        )
        live = pref.join(
            pref.groupBy("g").count().where(F.col("count") <= SHINGLE_DF_CAP).drop("count"),
            "g",
        )
    return (
        live.alias("a")
        .join(
            live.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH t AS ({_SHINGLES_SQL}),
    x AS (SELECT doc_id, unnest(sh) AS g FROM t),
    c AS (SELECT doc_id, len(sh) AS n_sh FROM t),
    p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM x a JOIN x b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.doc_a, p.doc_b, p.n_common,
           (ca.n_sh + cb.n_sh - p.n_common) AS n_union,
           p.n_common::DOUBLE / (ca.n_sh + cb.n_sh - p.n_common) AS jaccard
    FROM p
    JOIN c ca ON ca.doc_id = p.doc_a
    JOIN c cb ON cb.doc_id = p.doc_b
    WHERE p.n_common::DOUBLE / (ca.n_sh + cb.n_sh - p.n_common) >= {JACCARD_THRESHOLD}
    """,
    doc="n-gram Jaccard near-dup pairs via shared-shingle blocking",
    survey_ref="training-pipeline ops (n-gram Jaccard dedup)",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact Jaccard over distinct 3-gram shingles,
    via LOSSLESS prefix filtering (the AllPairs/PPJoin family):

    For Jaccard >= tau, a qualifying pair shares >= ceil(tau*n) of
    either doc's n shingles, so under ANY global total order the first
    ``n - floor(tau*n) + 1`` shingles of each doc must contain a common
    element. Only that prefix is exploded into the blocking self-join —
    tau=0.5 quarters the candidate pairs vs full explode, with zero
    recall loss. Candidates are then verified EXACTLY from the two
    docs' full shingle arrays (``array_intersect`` — one row per
    candidate, no count aggregation over shared-shingle multiplicity).

    Two selectable global orders (BOTH lossless — any total order is):

    * ``lex`` (default): lexicographic. Prefix extraction is a ZERO-
      shuffle in-row ``array_sort`` + ``slice`` — the cheapest linear
      path, right when the corpus vocabulary is not heavily zipfian
      (measured at sf0.1: lex 11.4s vs df-order 18.9s warm; df-order's
      re-rank overhead exceeds its 28% candidate saving, 613k->441k).
    * ``df``: ascending global document frequency, ties lexicographic —
      the canonical PPJoin token order. Prefixes then hold each doc's
      RAREST shingles, collapsing the Σ df² candidate term. Costs one
      df aggregation + one re-rank shuffle over the full shingle set —
      linear work traded against the quadratic candidate term, which
      WINS on a web-scale zipfian corpus where a few shingles have huge
      df. Select via SPARK_GRAFT_JACCARD_ORDER=df.

    Equality of the two orders' outputs is pytest-asserted
    (test_dedup_order.py) — the prefix filter is lossless under either.

    Skew defense on top: prefix shingles with document frequency above
    SHINGLE_DF_CAP are dropped from candidate generation (stop-shingle
    capping), and no broadcast hints — AQE picks the join strategy from
    observed sizes."""
    import os as _os

    order = _os.environ.get("SPARK_GRAFT_JACCARD_ORDER", "lex")
    d = _t(spark, sf_dir, "documents").where(F.size(F.split("text", " ")) >= 3)
    sh = d.select("doc_id", shingles_col(F.split("text", " ")).alias("sh"))
    cand = _jaccard_candidates(sh, order)
    a, b = sh.alias("sa"), sh.alias("sb")
    n_common = F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
    n_union = F.size(F.col("sa.sh")) + F.size(F.col("sb.sh")) - n_common
    jac = n_common.cast("double") / n_union
    return (
        cand.join(a, F.col("sa.doc_id") == F.col("doc_a"))
        .join(b, F.col("sb.doc_id") == F.col("doc_b"))
        .where(jac >= JACCARD_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            n_common.alias("n_common"),
            n_union.alias("n_union"),
            jac.alias("jaccard"),
        )
    )


def minhash_sig_col(sh_col="sh") -> F.Column:
    """K-permutation MinHash signature computed in ONE fold over the
    shingle array: a K-slot running-min array updated per shingle. The
    shingle hash is bound to a lambda variable (via the single-element
    transform) so its md5 evaluates exactly once per shingle — K
    per-permutation array_min passes would re-evaluate it K times
    (HOF lambdas don't share subexpressions). No explode, no shuffle.
    Bit-identical to the DuckDB oracle via the portable permutation
    family (functions/hashing.py)."""
    a_arr = F.array(*[F.lit(2 * i + 1).cast("long") for i in range(MINHASH_K)])
    b_arr = F.array(*[F.lit(7919 * (i + 1)).cast("long") for i in range(MINHASH_K)])
    return F.aggregate(
        F.col(sh_col),
        F.array_repeat(F.lit(MINHASH_P).cast("long"), MINHASH_K),
        lambda acc, s: F.element_at(
            F.transform(
                F.array(phash60(s) % MINHASH_P),
                lambda h: F.zip_with(
                    acc,
                    F.zip_with(a_arr, b_arr, lambda a, b: (a * h + b) % MINHASH_P),
                    lambda x, y: F.least(x, y),
                ),
            ),
            1,
        ),
    )


def lsh_bands(sigs: DataFrame) -> DataFrame:
    """(doc_id, b, band_key) — one row per LSH band of each signature."""
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.array_join(
                            F.transform(
                                F.slice("sig", LSH_ROWS * b + 1, LSH_ROWS),
                                lambda v: v.cast("string"),
                            ),
                            "-",
                        ).alias("band_key"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.b", "bk.band_key")


@register(
    "dedup_minhash_lsh",
    oracle=MINHASH_PAIRS_SQL,
    doc="MinHash(16) + LSH(4x4) near-dup candidates, Jaccard-verified",
    survey_ref="training-pipeline ops (MinHash+LSH dedup); skew note SURVEY §4",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection, the scale path for Jaccard
    dedup: signatures are built in one shuffle-free pass per doc
    (``minhash_sig_col``); only the 4 band keys per doc enter the
    candidate join."""
    d = _t(spark, sf_dir, "documents").where(F.size(F.split("text", " ")) >= 3)
    sh = d.select("doc_id", shingles_col(F.split("text", " ")).alias("sh"))
    sigs = sh.select("doc_id", "sh", minhash_sig_col().alias("sig"))
    bands = lsh_bands(sigs)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ta, tb = sh.alias("ta"), sh.alias("tb")
    n_common = F.size(F.array_intersect(F.col("ta.sh"), F.col("tb.sh")))
    n_union = F.size(F.array_distinct(F.concat(F.col("ta.sh"), F.col("tb.sh"))))
    return (
        cand.join(ta, F.col("ta.doc_id") == F.col("doc_a"))
        .join(tb, F.col("tb.doc_id") == F.col("doc_b"))
        .where(n_common.cast("double") / n_union >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", n_common.alias("n_common"), n_union.alias("n_union"))
    )


@register(
    "dedup_source_matrix",
    oracle=f"""
    WITH pairs AS ({MINHASH_PAIRS_SQL}),
    tagged AS (
        SELECT LEAST(da.source, db.source) AS source_x,
               GREATEST(da.source, db.source) AS source_y
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
    )
    SELECT source_x, source_y, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM tagged GROUP BY source_x, source_y
    """,
    doc="cross-source near-duplicate matrix: verified MinHash+LSH dup "
    "pairs grouped by unordered source pair — which corpus sources "
    "mirror each other (the pre-training mixture diagnostic that "
    "decides whether to drop a whole source vs dedup doc-by-doc)",
    survey_ref="training-pipeline ops: composition of dedup_minhash_lsh "
    "with source metadata; extends the reference's per-table verify "
    "counts to cross-source content overlap",
)
def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reuses the verified-pairs plan (signatures folded in one pass,
    4 band keys/doc, exact shingle recheck), then two broadcast-size
    joins to the (doc_id, source) projection and one tiny agg. Source
    names are ordered per pair (least/greatest) so the matrix is
    upper-triangular regardless of doc_id ordering."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    src = _t(spark, sf_dir, "documents").select("doc_id", "source")
    da, db = src.alias("da"), src.alias("db")
    tagged = (
        pairs.join(da, F.col("da.doc_id") == F.col("doc_a"))
        .join(db, F.col("db.doc_id") == F.col("doc_b"))
        .select(
            F.least(F.col("da.source"), F.col("db.source")).alias("source_x"),
            F.greatest(F.col("da.source"), F.col("db.source")).alias("source_y"),
        )
    )
    return tagged.groupBy("source_x", "source_y").agg(F.count("*").alias("n_pairs"))


# ---------------------------------------------------------------------------
# Incremental near-dup probe: an incoming batch checked against the
# already-indexed corpus (the CDC-ingest shape of near-dup dedup).
# ---------------------------------------------------------------------------

#: incoming-batch selector for the oracle query (doc_id % MOD == REM)
INCR_BATCH_MOD = 5
INCR_BATCH_REM = 4


def probe_lsh_index(new_bands: DataFrame, index_bands: DataFrame) -> DataFrame:
    """(doc_new, doc_existing) candidates — band-key equality between an
    incoming batch's bands and a maintained corpus band index. Work is
    O(batch bands): the corpus side is only touched through the join
    (bucketable on band_key at scale), never rescanned or re-hashed."""
    n, o = new_bands.alias("n"), index_bands.alias("o")
    return (
        n.join(
            o,
            (F.col("n.b") == F.col("o.b"))
            & (F.col("n.band_key") == F.col("o.band_key")),
        )
        .select(
            F.col("n.doc_id").alias("doc_new"),
            F.col("o.doc_id").alias("doc_existing"),
        )
        .distinct()
    )


@register(
    "dedup_incremental_lsh",
    oracle=incremental_lsh_sql(INCR_BATCH_MOD, INCR_BATCH_REM),
    doc="incoming batch probed against the corpus MinHash-LSH band "
    "index: band-equality candidates across the two sides, exact "
    "Jaccard verify — near-dup admission control at ingest",
    survey_ref="M2 ingest path x MinHash dedup; the at-ingest variant of "
    "dedup_minhash_lsh (index maintained, batch-only probe)",
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At 100 TB the full pairwise LSH join is a nightly job; ingest
    needs the INCREMENTAL form: signatures exist for the corpus (a
    maintained band table, refreshable from the change feed like
    vocab_rollup_incremental), so admitting a batch costs one
    signature pass over the BATCH plus one band-key join against the
    index — O(batch), independent of corpus size. Here both sides
    derive from the documents table split by a deterministic doc_id
    predicate; the probe itself is the production plan."""
    d = _t(spark, sf_dir, "documents").where(F.size(F.split("text", " ")) >= 3)
    sh = d.select("doc_id", shingles_col(F.split("text", " ")).alias("sh"))
    is_new = (F.col("doc_id") % INCR_BATCH_MOD) == INCR_BATCH_REM
    bands = lsh_bands(sh.select("doc_id", minhash_sig_col().alias("sig")))
    cand = probe_lsh_index(bands.where(is_new), bands.where(~is_new))
    tn, te = sh.alias("tn"), sh.alias("te")
    n_common = F.size(F.array_intersect(F.col("tn.sh"), F.col("te.sh")))
    n_union = F.size(F.array_distinct(F.concat(F.col("tn.sh"), F.col("te.sh"))))
    return (
        cand.join(tn, F.col("tn.doc_id") == F.col("doc_new"))
        .join(te, F.col("te.doc_id") == F.col("doc_existing"))
        .where(n_common.cast("double") / n_union >= JACCARD_THRESHOLD)
        .select(
            "doc_new",
            "doc_existing",
            n_common.alias("n_common"),
            n_union.alias("n_union"),
        )
    )


@register(
    "lsh_index_probe_lifecycle",
    oracle=incremental_lsh_sql(INCR_BATCH_MOD, INCR_BATCH_REM),
    doc="the MAINTAINED near-dup index end-to-end: corpus loaded into a "
    "CDC table in two commits with an incremental band-index refresh "
    "after each, then the incoming batch probed through the index's "
    "bucket-pruned path and exact-Jaccard verified — must equal the "
    "stateless two-sided band join the oracle computes",
    survey_ref="operators/lsh_index.py lifecycle; M2 ingest x MinHash "
    "dedup; the operator form of dedup_incremental_lsh",
)
def lsh_index_probe_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as ``dedup_incremental_lsh`` but the corpus side
    lives in a :class:`NearDupIndex` SnapshotTable maintained by TWO
    incremental snapshot-diff refreshes (so the refresh path, not just
    the probe, is under the oracle); the probe reads only the batch's
    band buckets. O(batch) at any corpus size."""
    import tempfile

    from ethereum_etl_airflow_spark.operators.cdc import apply_changes
    from ethereum_etl_airflow_spark.operators.lsh_index import NearDupIndex
    from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable

    d = _t(spark, sf_dir, "documents").where(F.size(F.split("text", " ")) >= 3)
    is_new = (F.col("doc_id") % INCR_BATCH_MOD) == INCR_BATCH_REM
    existing, batch = d.where(~is_new), d.where(is_new)

    hi = existing.agg(F.max("doc_id")).collect()[0][0]
    changes = existing.select(
        F.lit("I").alias("op"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("doc_id").alias("seq"),
        "text",
    )
    root = tempfile.mkdtemp(prefix="lsh_index_")
    table = SnapshotTable(spark, f"{root}/t", num_buckets=8)
    idx = NearDupIndex(table, f"{root}/ix", num_buckets=8)
    mid = int(hi) // 2
    apply_changes(table, changes.where(F.col("seq") <= mid), "lsh", epoch=0)
    idx.refresh()  # first build
    apply_changes(table, changes.where(F.col("seq") > mid), "lsh", epoch=1)
    idx.refresh()  # incremental diff refresh

    cand = idx.probe(batch.select(F.col("doc_id").cast("string").alias("doc_id"), "text")).select(
        F.col("doc_new").cast("long").alias("doc_new"),
        F.col("doc_existing").cast("long").alias("doc_existing"),
    )
    sh = d.select("doc_id", shingles_col(F.split("text", " ")).alias("sh"))
    tn, te = sh.alias("tn"), sh.alias("te")
    n_common = F.size(F.array_intersect(F.col("tn.sh"), F.col("te.sh")))
    n_union = F.size(F.array_distinct(F.concat(F.col("tn.sh"), F.col("te.sh"))))
    return (
        cand.join(tn, F.col("tn.doc_id") == F.col("doc_new"))
        .join(te, F.col("te.doc_id") == F.col("doc_existing"))
        .where(n_common.cast("double") / n_union >= JACCARD_THRESHOLD)
        .select(
            "doc_new",
            "doc_existing",
            n_common.cast("long").alias("n_common"),
            n_union.cast("long").alias("n_union"),
        )
    )


@register(
    "lsh_band_skew_profile",
    oracle=f"""
    WITH t AS ({_SHINGLES_SQL}),
    sig AS (
        SELECT doc_id, {_sig_sql()} AS sig FROM t
    ),
    bands AS (
        SELECT doc_id, b,
               array_to_string(sig[{LSH_ROWS}*b + 1 : {LSH_ROWS}*b + {LSH_ROWS}], '-') AS band_key
        FROM sig, (SELECT unnest(generate_series(0, {LSH_BANDS - 1})) AS b)
    ),
    bkt AS (
        SELECT b, band_key, COUNT(*) AS c FROM bands GROUP BY 1, 2
    )
    SELECT b,
           COUNT(*) AS n_buckets,
           MAX(c) AS max_bucket,
           CAST(SUM(c * (c - 1)) // 2 AS BIGINT) AS candidate_pairs
    FROM bkt GROUP BY b
    """,
    doc="LSH band-bucket skew census: per band, the bucket count, the "
    "hottest bucket, and the exact candidate-pair mass sum c*(c-1)/2 — "
    "the quantity that IS the band join's output size. The capacity-"
    "planning probe run before committing a full dedup_minhash_lsh "
    "pass (a degenerate shingle distribution shows up here as one "
    "monster bucket, caught at aggregate cost instead of join cost)",
    survey_ref="skew defense SURVEY §4 (ref 3,999-way RANGE_BUCKET "
    "partitioning exists for the same hot-key reason, "
    "build_partition_dag.py:108-140); pairs key_skew_profile",
)
def lsh_band_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: one narrow signature fold + inline band explode (no
    shuffle), then TWO bounded aggregates — (b, band_key) counts and
    the per-band census; every exchange carries counts, never docs.
    pair mass is pure integer arithmetic (sum(c*(c-1)) div 2)."""
    d = _t(spark, sf_dir, "documents").where(F.size(F.split("text", " ")) >= 3)
    sh = d.select("doc_id", shingles_col(F.split("text", " ")).alias("sh"))
    bands = lsh_bands(sh.select("doc_id", minhash_sig_col().alias("sig")))
    bkt = bands.groupBy("b", "band_key").agg(F.count("*").alias("c"))
    return bkt.groupBy("b").agg(
        F.count("*").alias("n_buckets"),
        F.max("c").alias("max_bucket"),
        F.expr("sum(c * (c - 1)) div 2").alias("candidate_pairs"),
    )


# ---------------------------------------------------------------------------
# Asymmetric containment (Broder 1997): |A ∩ B| / |A| — the near-
# SUPERSET detector Jaccard misses (a quote or excerpt inside a much
# larger doc has low Jaccard but high containment).
# ---------------------------------------------------------------------------

#: containment threshold as an exact integer fraction (3/5 = 0.6) —
#: the accept test is 5*n_common >= 3*n_sub in BOTH engines, so no
#: float boundary can disagree
CONTAIN_NUM, CONTAIN_DEN = 3, 5

#: a doc must have at least this many shingles to be a containment
#: SUBJECT (tiny docs are trivially "contained" everywhere)
MIN_CONTAIN_SH = 5


@register(
    "dedup_containment_pairs",
    oracle=f"""
    WITH t AS ({_SHINGLES_SQL}),
    e AS (
        SELECT doc_id, len(sh) AS n_sh, sh FROM t
        WHERE len(sh) >= {MIN_CONTAIN_SH}
    ),
    x AS (SELECT doc_id, unnest(sh) AS g FROM e),
    p AS (
        SELECT a.doc_id AS doc_sub, b.doc_id AS doc_sup,
               COUNT(*) AS n_common
        FROM x a JOIN x b ON a.g = b.g AND a.doc_id != b.doc_id
        GROUP BY 1, 2
    )
    SELECT p.doc_sub, p.doc_sup, ca.n_sh AS n_sub, p.n_common,
           p.n_common::DOUBLE / ca.n_sh AS containment
    FROM p JOIN e ca ON ca.doc_id = p.doc_sub
    WHERE {CONTAIN_DEN} * p.n_common >= {CONTAIN_NUM} * ca.n_sh
    """,
    doc="directed near-superset pairs: shingle containment "
    "|A∩B|/|A| >= 3/5 (Broder's asymmetric resemblance) — finds "
    "excerpts/quotes living inside larger docs, which Jaccard dedup "
    "structurally misses; exact integer threshold",
    survey_ref="training-pipeline ops: the asymmetric sibling of "
    "dedup_ngram_jaccard (same shingle kernel, AllPairs-style prefix "
    "candidates adapted to containment)",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment pairs via an asymmetric prefix filter.

    Pigeonhole for containment: if B holds >= ceil(t*|A|) of A's
    shingles, then among A's first ``|A| - ceil(t*|A|) + 1`` shingles
    under ANY fixed global order at least one is in B. So only A's
    prefix explodes on the probe side, while the build side indexes
    ALL shingles (B is unconstrained — that asymmetry IS containment):
    one shuffle on the shingle, candidates ~(1-t)·|A| per subject doc.
    Candidates verify EXACTLY from the two full shingle arrays with
    the integer cross-multiplied threshold. Stop-shingle df-cap on the
    probe side kills zipfian hubs (same defense and cap as
    dedup_ngram_jaccard; lossless below the cap)."""
    d = _t(spark, sf_dir, "documents").where(F.size(F.split("text", " ")) >= 3)
    sh = (
        d.select("doc_id", shingles_col(F.split("text", " ")).alias("sh"))
        .where(F.size("sh") >= MIN_CONTAIN_SH)
    )
    n = F.size("sh")
    pref_len = (
        n
        - F.expr(f"({CONTAIN_NUM} * size(sh) + {CONTAIN_DEN - 1}) div {CONTAIN_DEN}")
        + 1
    ).cast("int")
    # join key = 60-bit shingle hash, not the string: the build side is
    # the FULL shingle stream, so shuffle width matters; a hash
    # collision can only ADD a candidate, and every candidate is
    # verified exactly below — lossless
    pref = sh.select(
        F.col("doc_id").alias("doc_sub"),
        F.explode(F.slice(F.array_sort("sh"), F.lit(1), pref_len)).alias("gs"),
    ).select("doc_sub", phash60(F.col("gs")).alias("g"))
    pref = pref.join(
        pref.groupBy("g").count().where(F.col("count") <= SHINGLE_DF_CAP).drop("count"),
        "g",
    )
    alle = sh.select(
        F.col("doc_id").alias("doc_sup"), F.explode("sh").alias("gs")
    ).select("doc_sup", phash60(F.col("gs")).alias("g"))
    cand = (
        pref.join(alle, "g")
        .where(F.col("doc_sub") != F.col("doc_sup"))
        .select("doc_sub", "doc_sup")
        .distinct()
    )
    a, b = sh.alias("ca"), sh.alias("cb")
    n_common = F.size(F.array_intersect(F.col("ca.sh"), F.col("cb.sh")))
    n_sub = F.size(F.col("ca.sh"))
    return (
        cand.join(a, F.col("ca.doc_id") == F.col("doc_sub"))
        .join(b, F.col("cb.doc_id") == F.col("doc_sup"))
        .where(F.lit(CONTAIN_DEN) * n_common >= F.lit(CONTAIN_NUM) * n_sub)
        .select(
            "doc_sub",
            "doc_sup",
            n_sub.alias("n_sub"),
            n_common.alias("n_common"),
            (n_common.cast("double") / n_sub).alias("containment"),
        )
    )
