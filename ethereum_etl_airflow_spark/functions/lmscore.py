"""Held-out bigram LM scoring with Stupid Backoff — the perplexity
filter proper, in exact integer bits.

``text_unigram_surprisal`` scores documents against the corpus's own
unigram distribution; a real perplexity filter scores documents
against a model trained on OTHER data, where unseen n-grams force a
backoff path. This operator makes that split explicit and keeps every
probability comparison integer-exact:

* **model half**: documents with even ``doc_id`` supply the bigram
  counts ``c2(w1,w2)``; context totals ``ctx(w1) = Σ_w2 c2`` and the
  +1-smoothed unigram table ``c1(w2) = Σ_w1 c2`` are BOTH derived from
  the bigram table, so numerator and denominator are consistent and
  the model half of the corpus is scanned exactly once (every
  downstream consumer shares c2's shuffle via ReuseExchange).
* **scored half**: documents with odd ``doc_id``; each bigram instance
  costs, in whole bits:
    - seen bigram:   ``floor_log2(ctx(w1) div c2(w1,w2))``
    - backoff:       ``floor_log2((T + V) div (c1(w2) + 1)) + 4``
  where the ``+4`` is Stupid Backoff's multiplicative α fixed at 1/16
  (Brants et al. 2007 use 0.4; 1/16 keeps the penalty an exact
  integer bit count so both engines agree bit-for-bit). Add-one
  smoothing over the model vocabulary V covers words never seen at
  all. ``floor_log2(n)`` is ``bit_length(n) - 1`` — exact on BIGINT.

High mean bits = improbable text under the reference model — the
CCNet/Gopher-style perplexity quality gate, ln-free.

Scale notes (100 TB): one bigram explode per half; the model tables
are |vocab|- and |bigram-vocab|-sized (zipfian-small vs the corpus) so
AQE broadcasts both scoring joins; the seen/backoff choice is a
coalesce after a LEFT join, not a second pass. No window, no sort.

Reference parity: verify-stage cross-table reconciliation discipline
(audit the model against held-out data the way the reference audits
sibling tables); SURVEY §2.9 training-data extension family; Stupid
Backoff is public (Brants et al., EMNLP 2007 "Large Language Models in
Machine Translation").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register

#: Stupid Backoff α = 1/16 → integer penalty of 4 bits
_BACKOFF_BITS = 4

_ORACLE = f"""
    WITH sp AS (
        SELECT doc_id, string_split(text, ' ') AS w
        FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        FROM sp, unnest(generate_series(1, len(w) - 1)) AS u(i)
    ),
    model AS (SELECT w1, w2 FROM bg WHERE doc_id % 2 = 0),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM model GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS ctx FROM c2 GROUP BY 1),
    uni AS (SELECT w2 AS w, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
    tv AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS t_total,
               CAST(COUNT(*) AS BIGINT) AS v FROM uni
    ),
    scored AS (
        SELECT b.doc_id,
               CASE WHEN c2.c2 IS NOT NULL
                    THEN CAST(length(bin(ctx.ctx // c2.c2)) - 1 AS BIGINT)
                    ELSE CAST(length(bin((tv.t_total + tv.v)
                                         // (COALESCE(uni.c1, 0) + 1))) - 1
                              AS BIGINT) + {_BACKOFF_BITS}
               END AS bits
        FROM bg b
        LEFT JOIN c2  ON c2.w1 = b.w1 AND c2.w2 = b.w2
        LEFT JOIN ctx ON ctx.w1 = b.w1
        LEFT JOIN uni ON uni.w = b.w2
        CROSS JOIN tv
        WHERE b.doc_id % 2 = 1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(bits) AS BIGINT) AS sum_bits,
           CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS mean_bits
    FROM scored GROUP BY doc_id
"""


@register(
    "text_bigram_surprisal_backoff",
    oracle=_ORACLE,
    doc="held-out bigram-LM surprisal with Stupid Backoff (α=1/16 → "
    "integer +4-bit penalty): even docs train the model, odd docs are "
    "scored; seen bigrams cost floor_log2(ctx div c2), unseen back off "
    "to the +1-smoothed unigram — every step exact integer bits, one "
    "double division per doc at the end",
    survey_ref="perplexity quality filter (CCNet/Gopher discipline) in "
    "the ln-free integer-bits form; Stupid Backoff Brants et al. 2007; "
    "pairs text_unigram_surprisal (self-scored) and lm_kneser_ney_counts",
)
def text_bigram_surprisal_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One bigram explode per half; model tables are vocab-sized so
    both scoring joins broadcast under AQE; the seen/backoff branch is
    a coalesce over ONE left join each — never a second scoring pass.
    floor_log2 = length(bin(n)) - 1 on longs, exact on both engines."""
    d = _t(spark, sf_dir, "documents")
    sp = d.select("doc_id", F.split("text", " ").alias("w")).where(
        F.size("w") >= 2
    )
    bg = sp.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), "
                "i -> struct(element_at(w, i) as w1, element_at(w, i + 1) as w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2").where(
        # split() never yields NULL tokens, so this filters nothing —
        # but stating it EXPLICITLY keeps Catalyst's inferred join-key
        # null filters from differing per branch (isnotnull(w1) under
        # ctx, isnotnull(w2) under uni, both under c2, none under tv),
        # which would break canonical plan equality and with it the
        # exchange reuse that collapses the model half to one scan.
        F.col("w1").isNotNull() & F.col("w2").isNotNull()
    )

    model = bg.where(F.col("doc_id") % 2 == 0)
    c2 = model.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    # ctx, uni and tv ALL derive from c2 (c1(w2) = Σ_w1 c2(w1,w2)), so
    # the model half of the corpus is scanned once: every consumer
    # shares c2's shuffle subtree and ReuseExchange collapses the scans.
    ctx = c2.groupBy("w1").agg(F.sum("c2").alias("ctx"))
    uni = c2.groupBy(F.col("w2").alias("w")).agg(F.sum("c2").alias("c1"))
    tv = uni.agg(
        F.sum("c1").alias("t_total"), F.count("*").alias("v")
    )

    def bits_of(n):
        return (F.length(F.bin(n)) - 1).cast("long")

    scored = (
        bg.where(F.col("doc_id") % 2 == 1)
        .join(c2, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(uni, bg.w2 == uni.w, "left")
        .crossJoin(F.broadcast(tv))
        .select(
            "doc_id",
            F.when(
                F.col("c2").isNotNull(),
                bits_of(F.expr("ctx div c2")),
            )
            .otherwise(
                bits_of(
                    F.expr("(t_total + v) div (coalesce(c1, 0L) + 1L)")
                )
                + _BACKOFF_BITS
            )
            .alias("bits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("bits").alias("sum_bits"),
        (F.sum("bits").cast("double") / F.count("*")).alias("mean_bits"),
    )
