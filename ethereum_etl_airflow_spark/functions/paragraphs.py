"""Paragraph-level exact deduplication with document reassembly.

Doc-level dedup (``dedup_exact``/``dedup_minhash_lsh``) misses the
dominant duplication mode in web crawls: boilerplate *within* mostly
distinct pages (nav bars, license footers, quoted reposts). The
standard fix (MassiveText/Gopher, RefinedWeb) is paragraph-level
exact dedup: segment every document, keep only the globally-first
occurrence of each segment, and stitch the survivors back into a
cleaned document. The reference applies the same keep-first-occurrence
discipline at row grain in its amended-seed overrides
(dags/resources/stages/enrich/sqls/ amended tables pattern); here it
runs at sub-document grain.

Segmentation: the synthetic corpus has no newlines, so "paragraph" is
a deterministic fixed window of 8 whitespace words (same planted-
structure trick as ``text_redact_pii``/``url_canonical_dedup``) — the
operator mechanics (segment -> global first-occurrence -> reassemble)
are identical to newline paragraphs.

Scale notes (100 TB): segmentation is a narrow JVM map (split/slice/
array_join inside whole-stage codegen — no UDF). First-occurrence
ranking is ONE shuffle partitioned by the paragraph string; duplicate-
heavy keys are exactly the boilerplate paragraphs, and their partition
size is bounded by total corpus rows holding them — at 10^10 docs you
would swap the ties-broken window for a groupBy(paragraph).min(struct)
+ re-join if one paragraph exceeded a partition, but the plan shape
(hash by content key, rank, re-group by doc) is the one used in
production paragraph dedup. Reassembly is a second shuffle back to
doc_id grain, combiner-friendly and perfectly uniform (doc_id is
unique). Total: 2 exchanges, no broadcast, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ethereum_etl_airflow_spark.queries import _t, register

#: words per synthetic "paragraph" window
_PAR = 8


@register(
    "dedup_paragraph_exact",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    pars AS (
        SELECT doc_id,
               CAST((s - 1) // {_PAR} AS BIGINT) AS par_idx,
               array_to_string(list_slice(w, s, s + {_PAR} - 1), ' ') AS par
        FROM words, unnest(range(1, len(w) + 1, {_PAR})) AS t(s)
        WHERE len(w) > 0
    ),
    ranked AS (
        SELECT doc_id, par_idx, par,
               row_number() OVER (
                   PARTITION BY par ORDER BY doc_id, par_idx) AS rn
        FROM pars
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_pars,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN par END, ' '
                               ORDER BY par_idx), '') AS cleaned_text
    FROM ranked
    GROUP BY doc_id
    """,
    doc="paragraph-grain exact dedup: segment docs into 8-word windows, "
    "keep each window's globally-first occurrence, reassemble cleaned docs",
    survey_ref="training-pipeline ops: MassiveText/RefinedWeb paragraph "
    "dedup; keep-first-occurrence discipline as the reference's amended-"
    "seed overrides, applied at sub-document grain",
)
def dedup_paragraph_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment (narrow JVM map) -> rank first occurrence (ONE shuffle by
    paragraph content) -> reassemble per doc (one uniform shuffle).
    ``slice`` past the end truncates identically in Spark and DuckDB, so
    the ragged last window needs no special-casing."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    ).where(F.size("w") > 0)
    pars = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w), {_PAR}), "
                f"s -> struct(CAST((s - 1) DIV {_PAR} AS BIGINT) AS par_idx, "
                f"array_join(slice(w, s, {_PAR}), ' ') AS par))"
            )
        ).alias("p"),
    ).select("doc_id", "p.par_idx", "p.par")
    ranked = pars.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("par").orderBy("doc_id", "par_idx")
        ),
    )
    kept = F.when(F.col("rn") == 1, F.struct("par_idx", "par"))
    return ranked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_pars"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda x: x["par"]
            ),
            " ",
        ).alias("cleaned_text"),
    )


#: a window is boilerplate when it occurs in at least this many docs
_BOILER_DF = 4


@register(
    "text_boilerplate_strip",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    pars AS (
        SELECT doc_id,
               CAST((s - 1) // {_PAR} AS BIGINT) AS par_idx,
               array_to_string(list_slice(w, s, s + {_PAR} - 1), ' ') AS par
        FROM words, unnest(range(1, len(w) + 1, {_PAR})) AS t(s)
        WHERE len(w) > 0
    ),
    df AS (
        SELECT par, COUNT(DISTINCT doc_id)::BIGINT AS n_docs
        FROM pars GROUP BY 1
    ),
    mark AS (
        SELECT p.doc_id, p.par_idx, p.par,
               (d.n_docs >= {_BOILER_DF}) AS boiler
        FROM pars p JOIN df d ON p.par = d.par
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
           coalesce(string_agg(CASE WHEN NOT boiler THEN par END, ' '
                               ORDER BY par_idx), '') AS cleaned_text
    FROM mark
    GROUP BY doc_id
    """,
    doc=f"boilerplate removal by document frequency (CCNet-style): "
    f"segment into {_PAR}-word windows, a window occurring in >= "
    f"{_BOILER_DF} distinct docs is boilerplate (nav bars, footers, "
    "license blurbs) and is stripped from EVERY document — unlike "
    "dedup_paragraph_exact, which keeps the first occurrence; both "
    "removal modes exist in production pipelines and they compose",
    survey_ref="CCNet (Wenzek et al. 2020) / RefinedWeb line-frequency "
    "filtering; segmentation + reassembly shares "
    "dedup_paragraph_exact's plan; tokens-axis cleanup before "
    "bpe_encode_corpus",
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment (narrow codegen map) -> per-window distinct-doc count
    (one content-keyed shuffle, partial distinct combines map-side) ->
    join the df back on the SAME key (exchange reuse; boilerplate
    keys are by definition the hottest and stay bounded by doc count)
    -> reassemble per doc (one uniform shuffle). No Python anywhere."""
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.col("text"), " ").alias("w"))
        .where(F.size("w") > 0)
    )
    pars = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w), {_PAR}), "
                f"s -> struct(CAST((s - 1) DIV {_PAR} AS BIGINT) AS par_idx, "
                f"array_join(slice(w, s, {_PAR}), ' ') AS par))"
            )
        ).alias("p"),
    ).select("doc_id", "p.par_idx", "p.par")
    df = pars.groupBy("par").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs")
    )
    mark = pars.join(df, "par").withColumn(
        "boiler", F.col("n_docs") >= _BOILER_DF
    )
    kept = F.when(~F.col("boiler"), F.struct("par_idx", "par"))
    return mark.groupBy("doc_id").agg(
        F.sum(F.when(F.col("boiler"), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda x: x["par"]
            ),
            " ",
        ).alias("cleaned_text"),
    )
