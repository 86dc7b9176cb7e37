"""Corpus-hygiene operators for the training-data pipeline: benchmark
decontamination, intra-document repetition signals, and SimHash
near-dup pair detection.

These extend the reference's verify stage (per-table invariants run
after every load — build_load_dag.py:220-234, verify/sqls/*.sql) to
the document domain: before a corpus ships to training, contaminated
and pathological documents must be flagged the same way the reference
flags gap/duplicate block ranges.

All operators are built from the shared leaf helpers in
fingerprint.py (n-gram shingling, SimHash) and hashing.py (portable
md5-based hashes) so every result is value-identical to its DuckDB
oracle.

Scale notes (100 TB):
* decontamination joins the corpus's exploded n-grams against the
  DISTINCT benchmark n-gram set — benchmarks are tiny relative to the
  corpus (evals are MBs, the corpus is TBs), so the benchmark side is
  broadcast and the whole operator is one map-side hash semi-probe
  over the corpus scan, no corpus shuffle.
* repetition stats shuffle on (doc_id, gram) — uniform keys (doc_id
  dominates the hash), map-side combine collapses within-partition
  duplicates first.
* SimHash banding is pigeonhole-LOSSLESS: 60 signature bits split
  into 4 disjoint 15-bit bands means any pair within hamming
  distance 3 agrees exactly on at least one band, so the band-key
  equi-join provably yields every qualifying pair. Band keys spread
  over 4x2^15 join buckets; at larger scale widen the signature and
  band count (k bands of w bits catch hamming <= k-1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.fingerprint import (
    ngrams_col,
    ngrams_sql,
    simhash_expr,
    simhash_sql,
)
from ethereum_etl_airflow_spark.functions.hashing import phash60, phash60_sql
from ethereum_etl_airflow_spark.queries import _t, register

#: n-gram width for decontamination overlap (the 13-gram idea from
#: GPT-3/PaLM decontamination, sized down to the synthetic corpus)
DECONTAM_N = 4

#: every doc_id ≡ 0 (mod this) plays the held-out benchmark set
BENCH_MOD = 97

#: SimHash signature width / bands: 4 disjoint 15-bit bands over a
#: 60-bit signature — lossless for hamming <= 3
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
HAMMING_MAX = 3


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {ngrams_sql("string_split(text, ' ')", DECONTAM_N)} AS sh
        FROM documents
    ),
    bm AS (
        SELECT DISTINCT unnest(sh) AS s FROM t WHERE doc_id % {BENCH_MOD} = 0
    ),
    tr AS (
        SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s
        FROM t WHERE doc_id % {BENCH_MOD} <> 0
    )
    SELECT tr.doc_id,
           COUNT(*) AS n_hits,
           MAX(tr.n_sh) AS n_grams,
           COUNT(*)::DOUBLE / MAX(tr.n_sh) AS contamination_frac
    FROM tr JOIN bm USING (s)
    GROUP BY tr.doc_id
    """,
    doc="benchmark decontamination: flag training docs sharing any "
    f"{DECONTAM_N}-gram with the held-out benchmark partition "
    f"(doc_id % {BENCH_MOD} = 0)",
    survey_ref="training-pipeline ops: eval decontamination (the "
    "GPT-3 appendix-C n-gram overlap pattern); verify-stage analogue "
    "SURVEY §2.4",
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/benchmark n-gram overlap. The benchmark n-gram set is
    deduped then BROADCAST (held-out evals are tiny next to the
    corpus), so the corpus side streams through a map-side hash probe
    — no corpus shuffle; the only exchange is the per-doc hit count
    (uniform doc_id keys, map-side combine). Shingle arrays are
    already distinct per doc (w-shingling), so COUNT(*) after the
    probe equals distinct contaminated n-grams."""
    d = _t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", ngrams_col(F.split("text", " "), DECONTAM_N).alias("sh")
    )
    bench = (
        sh.where(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    train = sh.where(F.col("doc_id") % BENCH_MOD != 0).select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("s")
    )
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.max("n_sh").alias("n_grams"),
            (F.count("*").cast("double") / F.max("n_sh")).alias(
                "contamination_frac"
            ),
        )
    )


@register(
    "text_repetition_stats",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(toks) - 1),
                   i -> array_to_string(toks[i:i+1], ' '))) AS g
        FROM toks WHERE len(toks) >= 2
    ),
    c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g)
    SELECT doc_id,
           SUM(c)::BIGINT AS n_2gram,
           COUNT(*) AS n_uniq_2gram,
           MAX(c) AS top_2gram_cnt,
           1.0 - COUNT(*)::DOUBLE / SUM(c)::BIGINT AS dup_2gram_frac,
           MAX(c)::DOUBLE / SUM(c)::BIGINT AS top_2gram_frac
    FROM c GROUP BY doc_id
    """,
    doc="intra-document repetition signals: duplicate-bigram fraction "
    "and top-bigram share (the Gopher/MassiveText repetition filters)",
    survey_ref="training-pipeline ops: repetition filtering (Gopher "
    "rules); verify-stage analogue SURVEY §2.4",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram repetition: explode bigrams WITH
    multiplicity, count per (doc, gram) — uniform shuffle keys,
    map-side combine — then fold to per-doc totals. ``dup_2gram_frac``
    is 1 - distinct/total; ``top_2gram_frac`` is mode-count/total.
    Docs under 2 tokens have no bigrams and drop out (both sides)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(1)),
        lambda i: F.array_join(F.slice(toks, i, 2), " "),
    )
    g = (
        d.where(F.size(toks) >= 2)
        .select("doc_id", F.explode(grams).alias("g"))
    )
    c = g.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    total = F.sum("c")
    uniq = F.count("*")
    top = F.max("c")
    return c.groupBy("doc_id").agg(
        total.alias("n_2gram"),
        uniq.alias("n_uniq_2gram"),
        top.alias("top_2gram_cnt"),
        (F.lit(1.0) - uniq.cast("double") / total).alias("dup_2gram_frac"),
        (top.cast("double") / total).alias("top_2gram_frac"),
    )


@register(
    "simhash_near_dup_pairs",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
        SELECT doc_id,
               {simhash_sql(f"list_transform(toks, x -> {phash60_sql('x')})", SIMHASH_BITS)} AS sh
        FROM t
    ),
    bands AS (
        SELECT doc_id, sh, b,
               (sh >> ({SIMHASH_BAND_BITS} * b)) & {(1 << SIMHASH_BAND_BITS) - 1} AS bk
        FROM s, (SELECT unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS b)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        a.sh AS sh_a, b.sh AS sh_b
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b))::INT AS hamming
    FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {HAMMING_MAX}
    """,
    doc=f"SimHash near-dup pairs: {SIMHASH_BITS}-bit signature, "
    f"{SIMHASH_BANDS}x{SIMHASH_BAND_BITS}-bit band join (lossless for "
    f"hamming <= {HAMMING_MAX}), exact hamming verify",
    survey_ref="training-pipeline ops: SimHash near-dedup (Charikar "
    "2002 / Manku et al. 2007 web-dedup banding)",
)
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. One narrow map
    computes the 60-bit signature per doc (fused vote fold, no
    shuffle); posexplode fans each doc to its 4 (band, key) rows; the
    self equi-join on (band, key) generates candidates — provably ALL
    pairs within hamming 3 (pigeonhole over disjoint bands) — and the
    exact hamming check on the carried signatures filters them, no
    second lookup join. DISTINCT collapses pairs colliding in
    multiple bands — applied AFTER the hamming filter, so the
    dedup shuffle carries only surviving near-dup pairs, not the
    full band-collision candidate set (filter∘distinct ==
    distinct∘filter here; the cheap order wins at scale)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sig = simhash_expr(F.transform(toks, lambda x: phash60(x)), SIMHASH_BITS)
    s = d.select("doc_id", sig.alias("sh"))
    mask = (1 << SIMHASH_BAND_BITS) - 1
    band_keys = F.array(
        *[
            F.shiftright("sh", SIMHASH_BAND_BITS * b).bitwiseAND(F.lit(mask))
            for b in range(SIMHASH_BANDS)
        ]
    )
    bands = s.select(
        "doc_id", "sh", F.posexplode(band_keys).alias("b", "bk")
    )
    a, bb = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.where(ham <= HAMMING_MAX)
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .distinct()
    )
