"""T5-style span corruption: deterministic masked-span denoising pairs.

Denoising-objective training (T5/UL2 span corruption) needs every
document rewritten as an (input, target) pair: random spans of tokens
replaced by NUMBERED sentinels (``<extra_id_0>``, ``<extra_id_1>``,
...) in the input, and the target listing each sentinel followed by
the tokens it hid. At corpus scale the "randomness" must be a pure
function of (doc, position) — reruns, retries, and the DuckDB oracle
must all pick the SAME spans.

The trick that keeps this a ZERO-SHUFFLE narrow map: span membership
is *stateless*. A span STARTS at position p iff
``phash60(doc_id:p) % RATE == 0``; with fixed span length 2, position
p is masked iff a span starts at p or p-1 — and both are direct hash
evaluations, no lag window, no explode. Run starts (where a sentinel
goes) are likewise stateless: start(p) and not start(p-1) and not
start(p-2).

Sentinel NUMBERING (the T5 ``extra_id_k`` ordinal) is the one
stateful-looking piece — k = number of runs opened at or before p.
Neither engine has an init-seeded fold usable here (DuckDB 1.0's
``list_reduce`` pins the accumulator to the element type), so the
ordinal is recovered statelessly too: precompute the run-start
position list R once per document, then ``array_position(R, p) - 1``
IS the 0-based ordinal. That costs O(|R|) per run start (|R| ~ n/16)
but keeps the entire rewrite ``transform`` + ``flatten`` inside one
whole-stage-codegen projection — the same higher-order-function
discipline as ``text_fingerprint``'s fused SimHash, zero shuffles at
any corpus size.

Masking rate: RATE=8 starts ~12.5% of positions, span length 2 →
~23% of tokens masked (overlaps merge), near T5's 15-25% range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.hashing import phash60, phash60_sql
from ethereum_etl_airflow_spark.queries import _t, register

_RATE = 8


def _is_start(doc_id, p):
    """Span starts at 1-based position p (p < 1 -> false, stateless)."""
    h = phash60(F.concat(doc_id.cast("string"), F.lit(":"), p.cast("string")))
    return (p >= 1) & (h % _RATE == 0)


def span_corrupt(docs: DataFrame, tokens_expr) -> DataFrame:
    """documents -> (doc_id, input_tokens, target_tokens, counters)."""
    d = docs.select("doc_id", tokens_expr.alias("toks"))
    doc = F.col("doc_id")

    def masked(p):
        return _is_start(doc, p) | _is_start(doc, p - 1)

    def run_start(p):
        return (
            _is_start(doc, p)
            & ~_is_start(doc, p - 1)
            & ~_is_start(doc, p - 2)
        )

    seq = F.sequence(F.lit(1), F.size("toks"))
    # run-start position list, computed once per document; the ordinal
    # of a run start p is its 1-based index in this list
    d = d.withColumn("rst", F.filter(seq, run_start))

    def sentinel(p):
        return F.concat(
            F.lit("<extra_id_"),
            (F.array_position("rst", p) - 1).cast("string"),
            F.lit(">"),
        )

    tok = lambda p: F.element_at("toks", p)  # noqa: E731
    inp = F.flatten(
        F.transform(
            seq,
            lambda p: F.when(run_start(p), F.array(sentinel(p)))
            .when(masked(p), F.array().cast("array<string>"))
            .otherwise(F.array(tok(p))),
        )
    )
    tgt = F.flatten(
        F.transform(
            seq,
            lambda p: F.when(run_start(p), F.array(sentinel(p), tok(p)))
            .when(masked(p), F.array(tok(p)))
            .otherwise(F.array().cast("array<string>")),
        )
    )
    n_masked = F.size(F.filter(seq, masked))
    return d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        n_masked.cast("long").alias("n_masked"),
        F.size("rst").cast("long").alias("n_spans"),
        inp.alias("input_tokens"),
        tgt.alias("target_tokens"),
    )


def _start_sql(p: str) -> str:
    h = phash60_sql(f"doc_id::VARCHAR || ':' || ({p})::VARCHAR")
    return f"(({p}) >= 1 AND {h} % {_RATE} = 0)"


_RUN_START_SQL = (
    f"({_start_sql('p')} AND NOT {_start_sql('p - 1')}"
    f" AND NOT {_start_sql('p - 2')})"
)
_MASKED_SQL = f"({_start_sql('p')} OR {_start_sql('p - 1')})"
_SENT_SQL = "('<extra_id_' || (list_position(rst, p) - 1)::VARCHAR || '>')"


@register(
    "corpus_span_corruption",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), r AS (
        SELECT doc_id, toks,
               list_filter(generate_series(1, len(toks)),
                           p -> {_RUN_START_SQL}) AS rst
        FROM t
    )
    SELECT doc_id,
           len(toks)::BIGINT AS n_tokens,
           len(list_filter(generate_series(1, len(toks)), p ->
               {_MASKED_SQL}))::BIGINT AS n_masked,
           len(rst)::BIGINT AS n_spans,
           flatten(list_transform(generate_series(1, len(toks)), p ->
               CASE
                 WHEN {_RUN_START_SQL} THEN [{_SENT_SQL}]
                 WHEN {_MASKED_SQL} THEN []
                 ELSE [toks[p]]
               END)) AS input_tokens,
           flatten(list_transform(generate_series(1, len(toks)), p ->
               CASE
                 WHEN {_RUN_START_SQL} THEN [{_SENT_SQL}, toks[p]]
                 WHEN {_MASKED_SQL} THEN [toks[p]]
                 ELSE []
               END)) AS target_tokens
    FROM r
    """,
    doc="T5 span corruption into (input, target) denoising pairs with "
    "numbered <extra_id_k> sentinels: span membership is a stateless "
    "hash of (doc_id, position) and the sentinel ordinal is the run "
    "start's index in the precomputed run-start list, so the whole "
    "rewrite is transform+flatten inside one codegen projection — "
    "zero shuffles, reruns and engines pick identical spans",
    survey_ref="training-pipeline ops (denoising-objective data prep; "
    "sibling of corpus_chunk_overlap / corpus_pack_sequences)",
)
def corpus_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ethereum_etl_airflow_spark.functions.text import tokens_col

    return span_corrupt(_t(spark, sf_dir, "documents"), tokens_col())
