"""Distributed BPE vocabulary learning (the tokens-axis flagship):
learn the first ``N_MERGES`` byte-pair merges from the corpus.

Classic BPE training (Sennrich et al. 2016, public literature) never
iterates over the corpus: ONE aggregation folds the corpus to a
(word, count) dictionary, and every merge round runs on that
dictionary alone. This operator keeps the dictionary DISTRIBUTED — at
web scale it is 10^8+ rows (too big to train driver-side, which is
what single-node tokenizer trainers do), but each round is just one
pair-count aggregation (map-side combined) plus a 1-row argmax
collect, so a round costs one small shuffle over the dict, not a
corpus pass.

Determinism contract (both engines implement it bit-identically):

* symbol strings are space-joined characters; a merge of pair "x y"
  rewrites the space-wrapped symbol string, replacing " x y " with
  " xy " left-to-right NON-OVERLAPPING, scan continuing after each
  replacement (the shared semantics of Java's ``String.replace`` and
  DuckDB's ``replace``) — so "a a a" merges to "aa a", exactly like
  the reference pair-merge loop applied greedily once per position;
* the winning pair each round is max total count, ties broken by the
  lexicographically SMALLEST pair.

The oracle unrolls the same rounds as generated SQL stages — the
whole derivation (dict, pair counts, argmax, rewrite) re-expressed
relationally, no literals smuggled from the Spark run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register

N_MERGES = 8

#: sentinel symbol for exhausted oracle stages (no pair left): its
#: merge pattern can never occur in a symbol string, making the stage
#: a no-op — mirroring the Spark loop's early break
_NEVER = "chr(1)"


def _pairs_sql(sym_cte: str) -> str:
    s = "string_split(sym, ' ')"
    return f"""
        SELECT p AS pair, SUM(cnt) AS c FROM (
            SELECT cnt, unnest(list_transform(
                generate_series(1, len({s}) - 1),
                j -> {s}[j] || ' ' || {s}[j + 1])) AS p
            FROM {sym_cte})
        GROUP BY p
    """


def _bpe_oracle(n_merges: int) -> str:
    # Every stage CTE is MATERIALIZED: DuckDB inlines CTEs by default,
    # and sym{r+1} references sym{r} plus best{r} twice — inlining
    # re-expands the whole chain per reference (measured 444 s for 8
    # rounds at sf0.01; materialized: sub-second per stage).
    stages = [
        """
    words AS MATERIALIZED (
        SELECT w AS word, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    sym0 AS MATERIALIZED (
        SELECT rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym, cnt
        FROM words
    )"""
    ]
    for r in range(n_merges):
        best = f"best{r}"
        pair = f"(SELECT pair FROM {best})"
        stages.append(f"""
    pairs{r} AS MATERIALIZED ({_pairs_sql(f'sym{r}')}),
    {best} AS MATERIALIZED (SELECT pair, c FROM pairs{r} ORDER BY c DESC, pair ASC LIMIT 1),
    sym{r + 1} AS MATERIALIZED (
        SELECT trim(replace(' ' || sym || ' ',
                   ' ' || COALESCE({pair}, {_NEVER}) || ' ',
                   ' ' || replace(COALESCE({pair}, {_NEVER}), ' ', '') || ' ')) AS sym,
               cnt
        FROM sym{r})""")
    unions = "\n    UNION ALL\n".join(
        f"    SELECT {r + 1} AS merge_rank, pair, "
        f"replace(pair, ' ', '') AS merged, c::BIGINT AS pair_count FROM best{r}"
        for r in range(n_merges)
    )
    return f"WITH {','.join(stages)}\n{unions}"


@register(
    "bpe_learn_merges",
    oracle=_bpe_oracle(N_MERGES),
    doc=f"first {N_MERGES} BPE merges learned from the corpus: one "
    "corpus fold to a distributed (word,count) dict, then one pair-"
    "count aggregation + 1-row argmax per round",
    survey_ref="training-pipeline ops, tokens axis: BPE tokenizer "
    "training at corpus scale (single-node trainers hold the word "
    "dict in RAM; here it stays a DataFrame)",
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym"), "cnt"
        )
        .localCheckpoint()  # dict reused every round; truncate lineage
    )
    merges: list[tuple[int, str, str, int]] = []
    for r in range(N_MERGES):
        sarr = F.split("sym", " ")
        pairs_arr = F.when(
            F.size(sarr) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(sarr) - 1),
                lambda j: F.concat_ws(
                    " ", F.element_at(sarr, j), F.element_at(sarr, j + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        top = (
            words.select("cnt", F.explode(pairs_arr).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, count = top[0]["pair"], int(top[0]["c"])
        merged = pair.replace(" ", "")
        merges.append((r + 1, pair, merged, count))
        words = words.select(
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                    F.lit(f" {pair} "),
                    F.lit(f" {merged} "),
                )
            ).alias("sym"),
            "cnt",
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, merged string, pair_count bigint"
    )


def _bests_sql(n_merges: int) -> str:
    """One-row CTE exposing the n winning pairs as columns p0..p{n-1}
    (chr(1) when a round exhausted), for use inside encode lambdas."""
    cols = ", ".join(
        f"COALESCE((SELECT pair FROM best{r}), {_NEVER}) AS p{r}"
        for r in range(n_merges)
    )
    return f"SELECT {cols}"


def _encode_oracle(n_merges: int) -> str:
    # reuse the learn oracle's stage CTEs (words/sym0..symN/bestN),
    # then encode every document word with the same replace chain
    learn = _bpe_oracle(n_merges)
    stages = learn.split("\n    SELECT 1 AS merge_rank")[0]  # WITH ... )
    expr = "' ' || rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' '"
    for r in range(n_merges):
        expr = (
            f"replace({expr}, ' ' || b.p{r} || ' ', "
            f"' ' || replace(b.p{r}, ' ', '') || ' ')"
        )
    # MATERIALIZED: DuckDB inlines CTEs by default, which would
    # re-expand the whole stage chain for every p{r} reference (and
    # per encode row); materializing pins the 1-row pair table
    return f"""{stages},
    bests AS MATERIALIZED ({_bests_sql(n_merges)}),
    docs AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), w -> w <> '') AS ws
        FROM documents
    ), enc AS (
        SELECT doc_id,
               flatten(list_transform(ws,
                   w -> string_split(trim({expr}), ' '))) AS tokens
        FROM docs CROSS JOIN bests b
    )
    SELECT doc_id, tokens, len(tokens)::BIGINT AS n_tok FROM enc
    """


@register(
    "bpe_encode_corpus",
    oracle=_encode_oracle(N_MERGES),
    doc="BPE ENCODE: apply the learned merges to every document — "
    "merges collected once (bounded: N_MERGES rows), then the encode "
    "is a zero-shuffle narrow map (char-split + one replace per merge "
    "rank inside a single transform projection). Applying merges in "
    "learning order with replace-all reproduces the training "
    "segmentation exactly — the oracle re-derives the merges from "
    "scratch and encodes independently",
    survey_ref="tokens-axis encode path closing the loop with "
    "bpe_learn_merges (Sennrich et al. 2016); produces the CDC "
    "target's (doc_id, tokens, n_tok) contract like "
    "corpus_tokenize_vocab",
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn step: N_MERGES bounded collect (the corpus_tokenize_vocab
    literal-vocab discipline). Encode plan: ONE scan, one codegen
    projection — per word, the space-wrapped symbol string goes
    through the merge replaces in rank order; word boundaries are
    preserved because encoding runs inside transform(words)."""
    merges = [
        (row["pair"], row["merged"])
        for row in bpe_learn_merges(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    d = _t(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != "")

    def enc(w):
        sym = F.concat(
            F.lit(" "),
            F.rtrim(F.regexp_replace(w, "(.)", "$1 ")),
            F.lit(" "),
        )
        for pair, merged in merges:
            sym = F.replace(sym, F.lit(f" {pair} "), F.lit(f" {merged} "))
        return F.split(F.trim(sym), " ")

    toks = F.flatten(F.transform(ws, enc))
    return d.select(
        "doc_id",
        toks.alias("tokens"),
        F.size(toks).cast("long").alias("n_tok"),
    )
