"""Text-analysis operators for the training-data pipeline: token
statistics, quality scoring, language ID, document fingerprinting.

These extend the reference's data-quality stage (verify/sqls/*.sql —
per-table invariants run after every load, build_load_dag.py:220-234)
to the document/token domain a 100 TB training-data pipeline needs.

All operators are pure ``pyspark.sql.functions`` column expressions —
JVM-side, whole-stage-codegen, zero Python in the hot path. Every
query has a value-identical DuckDB oracle (portable md5-based hashing,
integer/decimal arithmetic — see functions/hashing.py).

Scale notes: every operator here is a narrow map over the documents
scan (no shuffle at all); Catalyst prunes the parquet scan to the
referenced columns. At 100 TB these run at IO speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.fingerprint import simhash_expr
from ethereum_etl_airflow_spark.functions.hashing import phash60, phash60_sql
from ethereum_etl_airflow_spark.queries import _t, register

# Tiny per-language stopword profiles (language-ID by vocabulary hit
# rate — the classic n-gram/stopword heuristic, deterministic argmax).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "value", "fast", "key"],
    "es": ["el", "la", "de", "y", "que", "valor", "datos"],
    "de": ["der", "die", "das", "und", "zu", "wert", "daten"],
    "fr": ["le", "la", "de", "et", "que", "valeur"],
}


def tokens_col(text=None):
    """Whitespace tokenization (single-space corpus); the BPE-ish
    variant below splits word-internal digit/alpha boundaries too."""
    return F.split(F.col("text") if text is None else text, " ")


def bpe_ish_tokens(text=None):
    """Regex pre-tokenizer in the GPT-2 spirit: words, numbers, and
    punctuation runs become separate tokens (a deterministic stand-in
    for a real BPE vocab — counts approximate BPE token counts)."""
    text = F.col("text") if text is None else text
    return F.filter(
        F.split(F.regexp_replace(text, r"(\d+|[^\w\s]+)", r" $1 "), r"\s+"),
        lambda t: t != "",
    )


@register(
    "text_token_stats",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, source, n_chars, string_split(text, ' ') AS toks
        FROM documents
    )
    SELECT doc_id, lang, source,
           len(toks) AS n_tok,
           len(list_distinct(toks)) AS n_uniq_tok,
           CAST(n_chars AS DOUBLE) / len(toks) AS avg_tok_len,
           len(list_distinct(toks))::DOUBLE / len(toks) AS uniq_ratio
    FROM t
    """,
    doc="token counting: whitespace tokens, distinct tokens, ratios",
    survey_ref="training-pipeline ops (task brief); verify-stage analogue SURVEY §2.4",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col()
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tok"),
        (F.col("n_chars").cast("double") / F.size(toks)).alias("avg_tok_len"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("uniq_ratio"),
    )


#: full quality-score derivation — the text_quality_score oracle,
#: reused as a subquery by the percentile-filter oracle below
_QUALITY_SQL = """
    WITH t AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    ), f AS (
        SELECT doc_id, n_chars, n_tok,
               len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) AS n_stop,
               len(list_filter(toks, x -> len(x) <= 2)) AS n_short
        FROM t
    )
    SELECT doc_id, n_tok, n_stop,
           n_stop::DOUBLE / n_tok AS stopword_ratio,
           n_short::DOUBLE / n_tok AS short_tok_ratio,
           (CASE WHEN n_tok BETWEEN 50 AND 100000 THEN 40 ELSE 0 END
            + CASE WHEN n_stop::DOUBLE / n_tok BETWEEN 0.01 AND 0.5 THEN 30 ELSE 0 END
            + CASE WHEN n_short::DOUBLE / n_tok < 0.3 THEN 30 ELSE 0 END) AS quality_score
    FROM f
    """


@register(
    "text_quality_score",
    oracle=_QUALITY_SQL,
    doc="quality scoring: length / stopword / short-token heuristics (C4-style filters)",
    survey_ref="training-pipeline ops; reference verify-stage analogue",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col()
    stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to")])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    n_short = F.size(F.filter(toks, lambda x: F.length(x) <= 2))
    stop_ratio = n_stop.cast("double") / n_tok
    short_ratio = n_short.cast("double") / n_tok
    score = (
        F.when((n_tok >= 50) & (n_tok <= 100_000), 40).otherwise(0)
        + F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.5), 30).otherwise(0)
        + F.when(short_ratio < 0.3, 30).otherwise(0)
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tok"),
        n_stop.alias("n_stop"),
        stop_ratio.alias("stopword_ratio"),
        short_ratio.alias("short_tok_ratio"),
        score.alias("quality_score"),
    )


def _langid_score(toks, lang: str):
    prof = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
    return F.size(F.filter(toks, lambda x: F.array_contains(prof, x)))


@register(
    "text_langid",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang AS lang_label, string_split(text, ' ') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, lang_label, len(toks) AS n_tok,
               len(list_filter(toks, x -> list_contains(['the','a','of','and','to','value','fast','key'], x))) AS s_en,
               len(list_filter(toks, x -> list_contains(['el','la','de','y','que','valor','datos'], x))) AS s_es,
               len(list_filter(toks, x -> list_contains(['der','die','das','und','zu','wert','daten'], x))) AS s_de,
               len(list_filter(toks, x -> list_contains(['le','la','de','et','que','valeur'], x))) AS s_fr
        FROM t
    )
    SELECT doc_id, lang_label, s_en, s_es, s_de, s_fr,
           CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM s
    """,
    doc="language ID: stopword-profile hit counts, deterministic argmax",
    survey_ref="training-pipeline ops (langid heuristic)",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col()
    s = {lang: _langid_score(toks, lang) for lang in ("en", "es", "de", "fr")}
    pred = (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]), "en")
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]), "es")
        .when(s["de"] >= s["fr"], "de")
        .otherwise("fr")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        s["en"].alias("s_en"),
        s["es"].alias("s_es"),
        s["de"].alias("s_de"),
        s["fr"].alias("s_fr"),
        pred.alias("lang_pred"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), h AS (
        SELECT doc_id, toks,
               list_transform(toks, x -> {phash60_sql('x')}) AS th
        FROM t
    )
    SELECT doc_id,
           {phash60_sql("array_to_string(toks[1:3], ' ')")} AS prefix_fp,
           list_min(th) AS min_tok_hash,
           list_sum(list_transform(generate_series(0, 31), i ->
               CASE WHEN list_sum(list_transform(th, x ->
                   CASE WHEN (x >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
               THEN 1 << i ELSE 0 END))::BIGINT AS simhash32
    FROM h
    """,
    doc="fingerprints: content-prefix hash, min-token-hash, 32-bit SimHash",
    survey_ref="training-pipeline ops (SimHash, rolling fingerprint)",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fingerprints, all via the portable hash: a prefix
    fingerprint (first 3 tokens — cheap exact-dup blocking key), the
    min token hash (1-perm MinHash), and a 32-bit SimHash (majority
    vote per bit over token hashes — Charikar 2002). Pure column
    expressions; the SimHash is one fused ``aggregate`` over the token
    array, no explode, no shuffle."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col()
    th = F.transform(toks, lambda x: phash60(x))
    # SimHash in ONE pass (fused vote fold — functions/fingerprint.py).
    simhash = simhash_expr(th, 32)
    return d.select(
        "doc_id",
        phash60(F.array_join(F.slice(toks, 1, 3), " ")).alias("prefix_fp"),
        F.array_min(th).alias("min_tok_hash"),
        simhash.alias("simhash32"),
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf AS DOUBLE) * ((n.n_docs + 1.0) / (dfreq.df + 1.0))
                   AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, score,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term ASC
               ) AS rnk
        FROM scored
    )
    SELECT doc_id, term, rnk, score FROM ranked WHERE rnk <= 3
    """,
    doc="top-3 characteristic terms per document by tf-idf; rational "
    "idf (N+1)/(df+1) — exactly-rounded IEEE division, so both engines "
    "agree bit-for-bit (ln is not exactly specified and may differ in "
    "the last ulp between libms)",
    survey_ref="training-pipeline ops: document keyword extraction / "
    "relevance features; skew note — the df join keys on common terms "
    "are zipfian, AQE skew-join splits them",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf top terms: one shuffle for (doc,term) counts, a map-side-
    combined df aggregate, a term join (AQE handles the zipfian skew),
    and a per-doc window (docs are small — no straggler). N is joined
    as a broadcast 1-row aggregate, not collected."""
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens_col()).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * ((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "term", "rnk", "score")
    )


@register(
    "quality_filter_by_percentile",
    oracle=f"""
    WITH s AS (
        SELECT d.source, q.doc_id, q.quality_score
        FROM ({_QUALITY_SQL}) q JOIN documents d USING (doc_id)
    ), r AS (
        SELECT source, doc_id, quality_score,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality_score) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM s
    ), th AS (
        SELECT source, quality_score AS p10
        FROM r WHERE rn = GREATEST(CAST(CEIL(0.10 * n) AS BIGINT), 1)
    )
    SELECT s.doc_id, s.source, s.quality_score, th.p10
    FROM s JOIN th USING (source)
    WHERE s.quality_score >= th.p10
    """,
    doc="per-source p10 quality floor: keep documents at or above the "
    "exact 10th-percentile score of their source — composition of the "
    "quality scorer with the distributed exact-quantile operator",
    survey_ref="training-pipeline ops: percentile-based corpus "
    "filtering (the C4/FineWeb pattern of per-domain adaptive "
    "thresholds instead of one global cutoff)",
)
def quality_filter_by_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholds come from exact_group_quantiles (deterministic
    bucket selection, no per-source sort straggler) and join back as
    a broadcast — two passes over the scored corpus, no window over
    full sources. Lazy import: registration modules never import each
    other at module top level (see veclib.py)."""
    from ethereum_etl_airflow_spark.functions.stats import exact_group_quantiles

    scored = text_quality_score(spark, sf_dir)
    src = _t(spark, sf_dir, "documents").select("doc_id", "source")
    qs = scored.join(src, "doc_id").select("doc_id", "source", "quality_score")
    th = exact_group_quantiles(qs, "source", "quality_score", (0.10,)).select(
        "source", F.col("value").alias("p10")
    )
    return (
        qs.join(F.broadcast(th), "source")
        .where(F.col("quality_score") >= F.col("p10"))
        .select("doc_id", "source", "quality_score", "p10")
    )


#: winnowing parameters: k-gram size (words) and window width. The
#: winnowing guarantee: every window of W consecutive k-grams
#: contributes >= 1 fingerprint, so any match of length >= W+k-1
#: words between two docs shares a fingerprint (Schleimer, Wilkerson
#: & Aiken, SIGMOD 2003 — the MOSS algorithm; public literature).
WINNOW_K = 2
WINNOW_W = 4


@register(
    "text_winnow_fingerprints",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
        FROM documents
    ), g AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, len(ws) - {WINNOW_K - 1}),
                   i -> {phash60_sql(
                       "array_to_string(ws[i:i+" + str(WINNOW_K - 1) + "], ' ')"
                   )}) AS h
        FROM t WHERE len(ws) >= {WINNOW_K}
    ), sel AS (
        SELECT doc_id, h,
               list_distinct(list_transform(
                   generate_series(1, len(h) - {WINNOW_W - 1}),
                   i -> list_max(list_filter(
                            generate_series(i, i + {WINNOW_W - 1}),
                            j -> h[j] = list_min(h[i:i+{WINNOW_W - 1}])))
               )) AS keep
        FROM g WHERE len(h) >= {WINNOW_W}
    )
    SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos, h[p] AS fp
    FROM sel, unnest(keep) AS k(p)
    """,
    doc=f"winnowing document fingerprints (MOSS): {WINNOW_K}-gram "
    f"hashes, rightmost-minimum selected per {WINNOW_W}-wide window, "
    "consecutive duplicates collapsed — every window contributes a "
    "fingerprint, so any shared passage of >= "
    f"{WINNOW_W + WINNOW_K - 1} words between two documents shares a "
    "(pos-independent) fp value; the local-algorithm guarantee SimHash "
    "(global) and span-ngram dedup (exact spans) don't give",
    survey_ref="training-pipeline fingerprint family: local sibling "
    "of text_fingerprint (SimHash, global) and dedup_span_ngrams "
    "(exact spans); Schleimer/Wilkerson/Aiken SIGMOD'03 (public "
    "algorithm spec, no code reused)",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: ONE narrow JVM projection per doc (k-gram hash array,
    per-window rightmost-argmin via filter+array_max inside transform,
    distinct, explode) — zero shuffles at any corpus size; the output
    is the (doc_id, pos, fp) posting list a plagiarism/overlap join
    buckets on fp downstream."""
    d = _t(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    grams = F.transform(
        F.sequence(F.lit(1), F.size("ws") - (WINNOW_K - 1)),
        lambda i: phash60(
            F.concat_ws(" ", *[F.element_at("ws", i + k) for k in range(WINNOW_K)])
        ),
    )
    # rightmost index of the window minimum, window starting at i
    def rightmost_min(i):
        win = F.slice("h", i, WINNOW_W)
        mn = F.array_min(win)
        return F.array_max(
            F.filter(
                F.sequence(i, i + (WINNOW_W - 1)),
                lambda j: F.element_at("h", j) == mn,
            )
        )

    keep = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("h") - (WINNOW_W - 1)), rightmost_min
        )
    )
    return (
        d.select("doc_id", ws.alias("ws"))
        .where(F.size("ws") >= WINNOW_K)
        .select("doc_id", grams.alias("h"))
        .where(F.size("h") >= WINNOW_W)
        .select("doc_id", "h", F.explode(keep).alias("p"))
        .select(
            "doc_id",
            (F.col("p") - 1).cast("long").alias("pos"),
            F.element_at("h", F.col("p")).alias("fp"),
        )
    )
