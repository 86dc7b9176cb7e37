"""Phrase-level statistics for the training-data pipeline: PMI-ranked
bigram collocations (tokenizer-merge / phrase-mining candidates) and
cross-document repeated-span detection (span-granular dedup in the
spirit of "Deduplicating Training Data Makes Language Models Better",
Lee et al. 2021 — word-granular here, suffix-array-free).

The reference pipeline stops at table-level parsing (its parse stage
emits decoded event rows — dags/ethereumetl_airflow/build_parse_dag.py);
a training-corpus engine additionally needs corpus-wide phrase
statistics to drive tokenizer construction (PMI feeds merge choice the
same way bpe_learn_merges' pair counts do) and span-level duplicate
removal (doc-level dedup misses boilerplate repeated INSIDE otherwise
unique docs).

Scale notes (100 TB):
* PMI: the unigram/bigram vocabularies are bounded by vocab size (and
  vocab², filtered by the min-count threshold), not by corpus size —
  after the two count aggregations (both map-side-combining, uniform
  word keys) everything downstream operates on vocab-sized data, so
  both count joins are BROADCAST and the final top-k window runs over
  a filtered vocab-bounded set. The corpus is scanned once, narrow.
* span dedup: one shuffle on the span hash (60-bit md5 — uniform keys,
  no skew) to compute document frequency, one shuffle back on the hash
  to tag the exploded spans, one on doc_id to re-aggregate. Spans
  travel as 60-bit hashes, not strings, so shuffle width is 8 bytes +
  ids. At 10^10 docs this is the same plan you'd run (Lee et al. do a
  suffix array precisely because they dedup at CHARACTER granularity;
  word-granular span sets are join-expressible and shuffle-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.fingerprint import ngrams_col, ngrams_sql
from ethereum_etl_airflow_spark.functions.hashing import phash60, phash60_sql
from ethereum_etl_airflow_spark.queries import _t, register

#: a bigram must occur at least this often to be PMI-scored (rare-pair
#: PMI explodes on singletons — standard collocation-mining floor)
PMI_MIN_COUNT = 5

#: how many top collocations the query emits
PMI_TOP_K = 200

#: repeated-span width in words
SPAN_N = 6


@register(
    "token_pmi_bigrams",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    big AS (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM toks, unnest(range(1, len(w))) AS u(i)
    ),
    uni AS (
        SELECT unnest(w) AS word FROM toks
    ),
    uc AS (
        SELECT word, COUNT(*) AS c FROM uni GROUP BY word
    ),
    n AS (
        SELECT SUM(c) AS total FROM uc
    ),
    bc AS (
        SELECT w1, w2, COUNT(*) AS n_pair
        FROM big GROUP BY w1, w2
        HAVING COUNT(*) >= {PMI_MIN_COUNT}
    ),
    scored AS (
        SELECT bc.w1, bc.w2, bc.n_pair,
               u1.c AS n_w1, u2.c AS n_w2,
               CAST(bc.n_pair * n.total AS DOUBLE)
                   / CAST(u1.c * u2.c AS DOUBLE) AS pmi_rate
        FROM bc
        JOIN uc u1 ON bc.w1 = u1.word
        JOIN uc u2 ON bc.w2 = u2.word
        CROSS JOIN n
    )
    SELECT w1, w2, n_pair, n_w1, n_w2, pmi_rate
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY pmi_rate DESC, w1, w2) AS rnk
        FROM scored
    ) WHERE rnk <= {PMI_TOP_K}
    """,
    doc="PMI-ranked adjacent-word collocations (phrase mining / "
    f"tokenizer-merge candidates): pairs with count >= {PMI_MIN_COUNT}, "
    f"top {PMI_TOP_K} by p(xy)/(p(x)p(y)) with deterministic tiebreak",
    survey_ref="training-pipeline ops: collocation mining for tokenizer "
    "construction (pairs feed BPE merge choice — cf. bpe_learn_merges); "
    "parse-stage aggregation analogue SURVEY §2.5",
)
def token_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide PMI collocations.

    The PMI ratio is computed EXACTLY as ``double(n_pair * N) /
    double(n_w1 * n_w2)`` — integer products (exact below 2^53) cast to
    double, then one IEEE-exactly-rounded division — so Spark and the
    DuckDB oracle agree bit-for-bit; no logarithms (PMI rank order is
    invariant under log, so the monotone ratio form carries the same
    information loss-free).

    Plan: one corpus scan exploded twice (bigrams + unigrams), two
    map-side-combining count aggregations, then vocab-bounded work
    only: the unigram count table is broadcast into both joins and the
    scalar total is a 1-row broadcast cross join. The final top-k
    window sorts the min-count-filtered collocation set (vocab²-bounded
    and small in practice; at extreme vocab sizes swap for the per-shard
    rank + global min-max refinement used by corpus_shuffle_shards).
    """
    d = _t(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("w")
    )
    # zip_with over the two shifted slices: slice length size-1 is 0 for
    # 1-token docs (split never yields an empty array), so no descending-
    # sequence guard is needed here, unlike sequence(1, n) shingling.
    sz1 = F.size("w") - F.lit(1)
    bigrams = d.select(
        F.explode(
            F.zip_with(
                F.slice("w", F.lit(1), sz1),
                F.slice("w", F.lit(2), sz1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    unigrams = d.select(F.explode("w").alias("word"))
    uc = unigrams.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    total = uc.agg(F.sum("c").alias("total"))
    bc = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= PMI_MIN_COUNT)
    )
    scored = (
        bc.join(F.broadcast(uc.withColumnRenamed("word", "w1")), "w1")
        .withColumnRenamed("c", "n_w1")
        .join(
            F.broadcast(
                uc.withColumnRenamed("word", "w2").withColumnRenamed("c", "n_w2")
            ),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            (
                (F.col("n_pair") * F.col("total")).cast("double")
                / (F.col("n_w1") * F.col("n_w2")).cast("double")
            ).alias("pmi_rate"),
        )
    )
    rnk = F.row_number().over(
        Window.orderBy(F.col("pmi_rate").desc(), "w1", "w2")
    )
    return (
        scored.withColumn("rnk", rnk)
        .where(F.col("rnk") <= PMI_TOP_K)
        .drop("rnk")
    )


@register(
    "dedup_span_ngrams",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               {ngrams_sql("string_split(text, ' ')", SPAN_N)} AS grams
        FROM documents
    ),
    ex AS (
        SELECT doc_id, len(grams) AS n_grams,
               {phash60_sql("unnest(grams)")} AS h
        FROM sh
    ),
    df AS (
        SELECT h, COUNT(*) AS n_docs FROM ex GROUP BY h
        HAVING COUNT(*) >= 2
    )
    SELECT ex.doc_id,
           MAX(ex.n_grams) AS n_grams,
           COUNT(*) AS n_dup_spans,
           CAST(COUNT(*) AS DOUBLE) / MAX(ex.n_grams) AS dup_frac
    FROM ex JOIN df USING (h)
    GROUP BY ex.doc_id
    """,
    doc=f"cross-document repeated-span detection: {SPAN_N}-word spans "
    "occurring in >= 2 distinct documents, reported per document with "
    "the duplicated fraction (span-granular dedup, Lee et al. 2021 "
    "word-granular variant)",
    survey_ref="training-pipeline ops: span-level dedup — doc-level "
    "dedup (dedup_exact/dedup_minhash_lsh) misses boilerplate repeated "
    "inside otherwise-unique docs",
)
def dedup_span_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spans repeated across documents.

    Shingles are distinct-per-doc (w-shingling), so the per-hash row
    count IS the document frequency — no COUNT(DISTINCT doc_id)
    needed. Spans travel the shuffles as 60-bit portable hashes
    (8 bytes), never as strings; collisions, if any, are identical in
    the oracle (same hash family), so the comparison stays exact.

    Plan: ONE pass — a count window over h replaces the agg+self-join
    form (which scanned and re-hashed every span twice); measured ~2x
    faster at sf0.1 (11.0 -> 5.4 s warm), same rows. The window's
    per-h partition holds exactly the rows the join's probe side
    shuffled anyway, so skew exposure is unchanged while the second
    scan, the second hash evaluation, and one exchange disappear.
    """
    d = _t(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id",
        ngrams_col(F.split("text", " "), SPAN_N).alias("grams"),
    ).select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.explode("grams").alias("g"),
    ).select("doc_id", "n_grams", phash60(F.col("g")).alias("h"))
    counted = ex.withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    return (
        counted.where(F.col("n_docs") >= 2)
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.count(F.lit(1)).alias("n_dup_spans"),
            (F.count(F.lit(1)).cast("double") / F.max("n_grams")).alias(
                "dup_frac"
            ),
        )
    )


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH ex AS (
        SELECT doc_id, h, COUNT(*) AS n_occ
        FROM (
            SELECT doc_id,
                   {phash60_sql("unnest(" + ngrams_sql("string_split(text, ' ')", SPAN_N) + ")")} AS h
            FROM documents
        )
        GROUP BY doc_id, h
    ), first_seen AS (
        SELECT h, MIN(doc_id) AS first_doc FROM ex GROUP BY h
    )
    SELECT ex.doc_id,
           COUNT(*) AS n_distinct_grams,
           COUNT(*) FILTER (WHERE f.first_doc = ex.doc_id) AS n_novel,
           (COUNT(*) FILTER (WHERE f.first_doc = ex.doc_id))::DOUBLE
               / COUNT(*) AS novelty_frac
    FROM ex JOIN first_seen f USING (h)
    GROUP BY ex.doc_id
    """,
    doc=f"per-document {SPAN_N}-gram novelty vs all earlier docs (by "
    "doc_id ingest order): the corpus-growth diminishing-returns curve "
    "— novelty_frac -> 0 signals the crawl is re-reading itself",
    survey_ref="training-pipeline ops: the longitudinal dual of "
    "dedup_span_ngrams — span dedup finds WHAT repeats, novelty tracks "
    "WHEN additions stop contributing new spans",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A gram is NOVEL in the doc with the minimum doc_id containing it
    (ingest order = doc_id in the fixtures; swap in the feed seq at
    ingest). Plan: distinct-per-doc grams (w-shingle discipline), one
    shuffle on the 8-byte gram hash for the min-doc table, the same
    shuffle key for the join back, one regroup on doc_id. Spans travel
    as 60-bit hashes; collisions (if any) are identical in the oracle
    (same hash family), so the comparison stays exact."""
    d = _t(spark, sf_dir, "documents")
    ex = (
        d.select(
            "doc_id",
            F.explode(ngrams_col(F.split("text", " "), SPAN_N)).alias("g"),
        )
        .select("doc_id", phash60(F.col("g")).alias("h"))
        .distinct()
    )
    first_seen = ex.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    novel = F.count_if(F.col("first_doc") == F.col("doc_id"))
    return (
        ex.join(first_seen, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_grams"),
            novel.alias("n_novel"),
            (novel.cast("double") / F.count(F.lit(1))).alias("novelty_frac"),
        )
    )


@register(
    "lm_kneser_ney_counts",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), big AS (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM toks, unnest(range(1, len(w))) AS u(i)
    ), uni AS (
        SELECT w1 AS word, COUNT(*)::BIGINT AS c_uni FROM big GROUP BY 1
    ), types AS (
        SELECT DISTINCT w1, w2 FROM big
    ), cont AS (
        SELECT w2 AS word, COUNT(*)::BIGINT AS n_left FROM types GROUP BY 1
    ), fan AS (
        SELECT w1 AS word, COUNT(*)::BIGINT AS n_right FROM types GROUP BY 1
    )
    SELECT u.word,
           u.c_uni,
           coalesce(c.n_left, 0)::BIGINT AS n_left_types,
           coalesce(f.n_right, 0)::BIGINT AS n_right_types
    FROM uni u
    LEFT JOIN cont c ON c.word = u.word
    LEFT JOIN fan f ON f.word = u.word
    """,
    doc="Kneser-Ney continuation statistics: per word, the raw unigram "
    "count, the number of DISTINCT left contexts (the KN continuation "
    "numerator — 'how many cups of tea': frequency in novel contexts, "
    "not raw frequency) and distinct right contexts (the backoff "
    "normalizer). Exact integers; the smoothing division happens at "
    "model-build time, outside the counts",
    survey_ref="training-pipeline LM statistics (n-gram LM smoothing, "
    "Kneser-Ney 1995 — public literature); bigram sibling of "
    "token_pmi_bigrams, count shapes of bpe_learn_merges",
)
def lm_kneser_ney_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One narrow bigram explode, a DISTINCT on bigram TYPES (the only
    corpus-sized shuffle — keys are uniform word pairs), then three
    vocab-bounded aggregates joined on the word. All downstream joins
    operate on vocabulary-sized tables (AQE broadcasts them); nothing
    after the type-distinct scales with corpus size."""
    d = _t(spark, sf_dir, "documents")
    w = F.split("text", " ")
    big = d.select(
        F.explode(
            F.zip_with(
                F.slice(w, 1, F.size(w) - 1),
                F.slice(w, 2, F.size(w) - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    uni = big.groupBy(F.col("w1").alias("word")).agg(
        F.count("*").alias("c_uni")
    )
    types = big.distinct()
    cont = types.groupBy(F.col("w2").alias("word")).agg(
        F.count("*").alias("n_left")
    )
    fan = types.groupBy(F.col("w1").alias("word")).agg(
        F.count("*").alias("n_right")
    )
    return (
        uni.join(cont, "word", "left")
        .join(fan, "word", "left")
        .select(
            "word",
            "c_uni",
            F.coalesce("n_left", F.lit(0)).cast("long").alias("n_left_types"),
            F.coalesce("n_right", F.lit(0)).cast("long").alias(
                "n_right_types"
            ),
        )
    )


@register(
    "dedup_substring_strip",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    ex AS (
        SELECT doc_id, i,
               {phash60_sql(f"array_to_string(w[i:i+{SPAN_N - 1}], ' ')")} AS h
        FROM t, unnest(range(1, len(w) - {SPAN_N - 2})) AS u(i)
    ),
    dup AS (
        SELECT h FROM ex GROUP BY h HAVING COUNT(*) >= 2
    ),
    ds AS (
        SELECT doc_id, list(i ORDER BY i) AS starts
        FROM ex JOIN dup USING (h) GROUP BY doc_id
    ),
    kept AS (
        SELECT t.doc_id, t.w, coalesce(ds.starts, []) AS starts,
               [t.w[j] FOR j IN range(1, len(t.w) + 1)
                IF len(list_filter(coalesce(ds.starts, []),
                                   s -> s <= j AND j <= s + {SPAN_N - 1})) = 0
               ] AS kept_toks
        FROM t LEFT JOIN ds USING (doc_id)
    )
    SELECT doc_id,
           len(w) AS n_tok,
           len(starts) AS n_dup_spans,
           len(w) - len(kept_toks) AS n_removed_tok,
           coalesce(array_to_string(kept_toks, ' '), '') AS kept_text,
           CAST(len(kept_toks) AS DOUBLE) / len(w) AS kept_frac
    FROM kept
    """,
    doc=f"exact duplicated-substring REMOVAL: every {SPAN_N}-word span "
    "occurring more than once in the corpus (across or within docs) is "
    "stripped; overlapping duplicated spans are coalesced into "
    "intervals and the document is rebuilt from the gap slices "
    "(ExactSubstr dedup, Lee et al. 2021, word-granular remove-all "
    "variant — cf. text_boilerplate_strip's keep-first paragraph form)",
    survey_ref="training-pipeline ops: the removal stage on top of "
    "dedup_span_ngrams' detection — doc-level dedup keeps boilerplate "
    "that repeats INSIDE otherwise-unique docs; this emits the cleaned "
    "corpus itself",
)
def dedup_substring_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip every corpus-duplicated span and rebuild the text.

    Pipeline (all shuffles carry 8-byte hashes + ids, never token
    arrays):

    1. positional spans — per doc, the {SPAN_N}-gram hash at every
       start offset (NOT distinct-per-doc: within-doc repeats count
       toward the corpus occurrence total, per "occurs more than once
       in the corpus");
    2. one count window over the span hash finds duplicated spans
       (same single-pass shape as dedup_span_ngrams — no agg+self-join
       double scan);
    3. duplicated start offsets regroup per doc (sorted);
    4. joined back to the token arrays, the offsets fold into MERGED
       disjoint intervals [s, s+N-1] (adjacent-or-overlapping spans
       coalesce — one O(|starts|) aggregate), and the kept text is the
       flattened gap slices between interval bounds: zip(0 ++ his,
       los ++ n+1) -> slice(w, e+1, l-e-1). Strictly linear in doc
       length — no per-token exists() scan, so a fully-boilerplate doc
       (|starts| ~ n) costs O(n), not O(n^2).

    The whole rebuild is a narrow JVM projection; at 10^10 docs the
    plan is the three bounded shuffles plus one corpus-wide map.
    """
    n1 = SPAN_N - 1
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    sz = F.size("w")
    span_hashes = F.when(
        sz >= SPAN_N,
        F.transform(
            F.sequence(F.lit(1), sz - F.lit(n1)),
            lambda i: phash60(F.array_join(F.slice("w", i, SPAN_N), " ")),
        ),
    ).otherwise(F.array().cast("array<long>"))
    ex = d.select("doc_id", F.posexplode(span_hashes).alias("pos0", "h")).select(
        "doc_id", (F.col("pos0") + 1).alias("i"), "h"
    )
    dup = ex.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("h"))
    ).where(F.col("cnt") >= 2)
    ds = dup.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("i")).alias("starts")
    )
    j = d.join(ds, "doc_id", "left").select(
        "doc_id",
        "w",
        F.coalesce("starts", F.array().cast("array<int>")).alias("starts"),
    )

    last = lambda acc: F.element_at(acc, -1)  # noqa: E731
    merged = F.aggregate(
        "starts",
        F.array().cast("array<struct<lo:int,hi:int>>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= last(acc)["hi"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc)["lo"].alias("lo"),
                        F.greatest(last(acc)["hi"], s + F.lit(n1)).alias("hi"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(s.alias("lo"), (s + F.lit(n1)).alias("hi"))
                ),
            )
        ),
    )
    j = j.withColumn("iv", merged)
    los = F.transform("iv", lambda v: v["lo"])
    his = F.transform("iv", lambda v: v["hi"])
    kept = F.flatten(
        F.zip_with(
            F.concat(F.array(F.lit(0)), his),
            F.concat(los, F.array(F.size("w") + 1)),
            lambda e, l: F.slice("w", e + 1, l - e - 1),
        )
    )
    removed = F.aggregate(
        "iv",
        F.lit(0),
        lambda acc, v: acc + v["hi"] - v["lo"] + 1,
    )
    return j.select(
        "doc_id",
        F.size("w").alias("n_tok"),
        F.size("starts").alias("n_dup_spans"),
        removed.alias("n_removed_tok"),
        F.array_join(kept, " ").alias("kept_text"),
        (
            (F.size("w") - removed).cast("double") / F.size("w")
        ).alias("kept_frac"),
    )
