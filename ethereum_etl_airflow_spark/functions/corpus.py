"""Corpus-preparation operators for a training-data pipeline:
sequence packing, stratified sampling, vocabulary building, mixture
upsampling.

The reference pipeline ends at parsed per-row tables (dags/resources/
stages/parse writes one decoded table per event); a training pipeline
continues from there: pack documents into fixed-length context
windows, rebalance sources, build the token vocabulary, and upsample
under-represented sources.  Each operator here is expressed
Spark-first with an eye on the 100 TB shape:

* ``corpus_pack_sequences`` — contiguous greedy packing by global
  token offset.  The global running sum is computed with a TWO-PHASE
  distributed scan (per-block partial sums -> tiny driver cumsum of
  block offsets -> broadcast back), NOT a single-partition global
  window: the classic parallel prefix-sum, so no stage ever sees more
  than one block's rows in one task.
* ``corpus_stratified_sample`` — deterministic per-source cap via
  portable hashing: keep doc iff ``phash60(doc) % source_count <
  CAP``.  Exact integer math, no float rates, replayable bit-for-bit
  by the oracle; per-source counts come from a broadcast-joined
  aggregate (source cardinality is bounded).
* ``corpus_vocab_topk`` — explode -> hash-agg (map-side combine) ->
  TakeOrdered top-k; token ids assigned by row_number over the k
  survivors only.
* ``corpus_mixture_upsample`` — epoch replication to flatten the
  source mixture: repeats = min(3, ceil(max_count / count)) computed
  in exact integer arithmetic, rows exploded via ``sequence()``
  (narrow op — no shuffle beyond the count aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ethereum_etl_airflow_spark.functions.hashing import phash60, phash60_sql
from ethereum_etl_airflow_spark.queries import _t, register

#: context-window length (tokens) for sequence packing
PACK_MAX_LEN = 512

#: documents per block for the two-phase prefix sum.  At 10^10 docs a
#: 10^6 block still leaves only 10^4 block offsets on the driver.
PACK_BLOCK = 100

#: per-source document cap for stratified sampling
SAMPLE_CAP = 15

#: max replication factor for mixture upsampling
MIX_MAX_EPOCHS = 3


def _docs_with_ntok(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )


def global_prefix_sum(df: DataFrame, order_col: str, val_col: str, block_size: int) -> DataFrame:
    """Exclusive global prefix sum of ``val_col`` in ``order_col``
    order, as a new column ``start`` — the distributed two-phase scan.

    Phase 1 aggregates one partial sum per block (monotone mapping of
    the order column, so block order == global order).  Phase 2 does a
    CUMSUM OVER BLOCKS on the driver — bounded at rows/block_size
    entries, e.g. 10^4 for 10^10 rows at block 10^6 — and broadcasts
    the offsets back.  Phase 3 is a per-block window.  No task ever
    materializes more than one block; contrast the naive
    ``Window.orderBy(order)`` which funnels the WHOLE table through a
    single partition.
    """
    blocked = df.withColumn("_blk", F.expr(f"{order_col} div {block_size}"))
    # phase 1+2: per-block sums -> driver cumsum (bounded) -> broadcast
    sums = blocked.groupBy("_blk").agg(F.sum(val_col).alias("_bsum")).collect()
    offsets, acc = [], 0
    for r in sorted(sums, key=lambda r: r["_blk"]):
        offsets.append((r["_blk"], acc))
        acc += r["_bsum"]
    off_df = df.sparkSession.createDataFrame(offsets, "_blk long, _boff long")
    # phase 3: in-block exclusive cumsum + block offset
    w = (
        W.partitionBy("_blk")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        blocked.join(F.broadcast(off_df), "_blk")
        .withColumn(
            "start",
            (F.sum(val_col).over(w) - F.col(val_col) + F.col("_boff")).cast("long"),
        )
        .drop("_blk", "_boff")
    )


@register(
    "corpus_pack_sequences",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ), o AS (
        SELECT doc_id, n_tok,
               SUM(n_tok) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok AS start
        FROM d
    )
    SELECT (start // {PACK_MAX_LEN})::BIGINT AS seq_id,
           COUNT(*) AS n_docs,
           SUM(n_tok)::BIGINT AS n_tokens,
           MIN(doc_id) AS first_doc_id,
           MAX(doc_id) AS last_doc_id
    FROM o GROUP BY 1
    """,
    doc=f"sequence packing into {PACK_MAX_LEN}-token context windows via "
    "a distributed two-phase prefix sum (no single-partition window)",
    survey_ref="training-data extension (SURVEY §2.9 family); packs the "
    "token stream the ref's parsed tables feed into fixed windows",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each document is assigned to the context window its FIRST token
    lands in (document-level greedy contiguous packing — a window may
    overflow by the tail of its last straddling doc; the packer's
    consumer truncates).  Deterministic: global order is doc_id."""
    d = _docs_with_ntok(spark, sf_dir).select("doc_id", "n_tok")
    o = global_prefix_sum(d, "doc_id", "n_tok", PACK_BLOCK)
    return (
        o.withColumn("seq_id", F.expr(f"start div {PACK_MAX_LEN}"))
        .groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


@register(
    "corpus_stratified_sample",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, source,
               COUNT(*) OVER (PARTITION BY source) AS cnt
        FROM documents
    )
    SELECT doc_id, source FROM c
    WHERE cnt <= {SAMPLE_CAP}
       OR {phash60_sql("'sample:' || CAST(doc_id AS VARCHAR)")} % cnt < {SAMPLE_CAP}
    """,
    doc=f"deterministic stratified sampling: cap each source at ~{SAMPLE_CAP} "
    "docs via portable-hash thresholding (exact integer rule, no float rates)",
    survey_ref="training-data extension; W2 LIMIT-sampling made "
    "deterministic and per-stratum",
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keep iff ``hash % source_count < CAP`` — every doc decides from
    (its own hash, its source's count) alone, so the filter is a
    broadcast join + narrow map: no shuffle of the fact table, no
    per-stratum sort, and adding data to ONE source never changes
    another source's sample."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    counts = d.groupBy("source").agg(F.count("*").alias("cnt"))
    h = phash60(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    return (
        d.join(F.broadcast(counts), "source")
        .where((F.col("cnt") <= SAMPLE_CAP) | (h % F.col("cnt") < SAMPLE_CAP))
        .select("doc_id", "source")
    )


@register(
    "corpus_vocab_topk",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), counts AS (
        SELECT token, COUNT(*) AS n FROM toks GROUP BY token
        ORDER BY n DESC, token ASC LIMIT 20
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) - 1 AS BIGINT)
               AS token_id,
           token, n
    FROM counts
    """,
    doc="vocabulary top-k: explode -> hash-agg with map-side combine -> "
    "TakeOrdered; ids assigned over the k survivors only",
    survey_ref="training-data extension; ref has no vocab stage — this is "
    "the BPE-vocab-counting step a tokenized-sequence table needs",
)
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The only wide op is the token-count agg (partial aggregation
    combines within each scan task first — vocab cardinality, not
    corpus size, crosses the wire).  The top-k is orderBy+limit, which
    Spark executes as TakeOrdered (per-partition heaps, no full sort);
    the row_number window runs over k rows."""
    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )
    w = W.orderBy(F.desc("n"), F.asc("token"))
    return toks.withColumn("token_id", (F.row_number().over(w) - 1).cast("long")).select(
        "token_id", "token", "n"
    )


@register(
    "corpus_mixture_upsample",
    oracle=f"""
    WITH c AS (
        SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source
    ), m AS (
        SELECT source, cnt,
               MAX(cnt) OVER () AS max_cnt
        FROM c
    ), r AS (
        SELECT source,
               LEAST({MIX_MAX_EPOCHS}, (max_cnt + cnt - 1) // cnt) AS repeats
        FROM m
    )
    SELECT d.doc_id, d.source, CAST(e.epoch AS INT) AS epoch
    FROM documents d
    JOIN r ON d.source = r.source
    CROSS JOIN LATERAL (SELECT unnest(generate_series(1, r.repeats)) AS epoch) e
    """,
    doc=f"mixture upsampling: replicate each source ceil(max/cnt) times "
    f"(capped at {MIX_MAX_EPOCHS} epochs) to flatten the source mixture",
    survey_ref="training-data extension; the dual of stratified "
    "downsampling — epoch-weighted source mixing",
)
def corpus_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts are one broadcast-sized aggregate (bounded source
    cardinality); replication is ``explode(sequence(1, repeats))`` — a
    narrow per-row generator, so the 100 TB cost is exactly the output
    volume, with no shuffle of the replicated rows."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    counts = d.groupBy("source").agg(F.count("*").alias("cnt"))
    mx = counts.agg(F.max("cnt").alias("max_cnt"))
    rep = (
        counts.crossJoin(F.broadcast(mx))
        .withColumn(
            "repeats",
            F.least(
                F.lit(MIX_MAX_EPOCHS),
                F.expr("(max_cnt + cnt - 1) div cnt"),
            ),
        )
        .select("source", "repeats")
    )
    return (
        d.join(F.broadcast(rep), "source")
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("repeats").cast("int"))))
        .select("doc_id", "source", "epoch")
    )


@register(
    "corpus_hash_split",
    oracle=f"""
    WITH s AS (
        SELECT CASE
                 WHEN {phash60_sql('doc_id::VARCHAR')} % 100 < 80 THEN 'train'
                 WHEN {phash60_sql('doc_id::VARCHAR')} % 100 < 90 THEN 'val'
                 ELSE 'test'
               END AS split,
               n_chars
        FROM documents
    )
    SELECT split, COUNT(*) AS n_docs, SUM(n_chars)::BIGINT AS total_chars
    FROM s GROUP BY split
    """,
    doc="deterministic 80/10/10 train/val/test assignment by portable "
    "content-independent key hash; counts verified per split",
    survey_ref="training-pipeline ops: reproducible dataset splits — "
    "hash-of-key assignment survives corpus growth (a doc never "
    "changes split when new docs arrive), unlike rand() or row-number "
    "splits",
)
def corpus_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split assignment is a pure narrow map (no shuffle until the
    audit aggregation); the same phash60 discipline as every other
    portable hash, so DuckDB reproduces the assignment bit-for-bit.
    At 100 TB the real pipeline writes `partitionBy(split)` with this
    same column; the registered query audits the per-split totals."""
    d = _t(spark, sf_dir, "documents")
    bucket = phash60(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


#: sliding context-window length / stride (tokens) for overlap chunking
CHUNK_LEN = 32
CHUNK_STRIDE = 24


@register(
    "corpus_chunk_overlap",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    e AS (
        SELECT doc_id, toks, len(toks) AS n_tok,
               unnest(range(0, len(toks), {CHUNK_STRIDE})) AS start
        FROM t
    )
    SELECT doc_id,
           CAST(start / {CHUNK_STRIDE} AS INT) AS chunk_id,
           list_slice(toks, CAST(start + 1 AS INT),
                      LEAST(CAST(start + {CHUNK_LEN} AS INT), n_tok)) AS chunk_tokens,
           LEAST(CAST({CHUNK_LEN} AS BIGINT), n_tok - start) AS chunk_len,
           n_tok
    FROM e
    """,
    doc=f"overlapping sliding token windows per document (len {CHUNK_LEN}, "
    f"stride {CHUNK_STRIDE}) — the RAG/long-context chunking shape",
    survey_ref="training-pipeline ops: complements corpus_pack_sequences "
    "(which concatenates ACROSS documents); this op windows WITHIN each "
    "document with overlap so no boundary context is lost",
)
def corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking is embarrassingly parallel: tokenize (narrow), explode
    a per-doc start-offset sequence (narrow — Spark's generate+explode
    never shuffles), slice each window out of the token array. Zero
    shuffles end-to-end at any corpus size; output row count is
    sum(ceil(n_tok/stride)) and each output partition derives from one
    input partition, so the 100 TB plan is a single scan-project
    stage. Spark ``sequence(0, n-1, s)`` (inclusive stop) and DuckDB
    ``range(0, n, s)`` (exclusive stop) generate identical start sets;
    ``F.slice`` takes a LENGTH and silently truncates at the array end,
    matching the oracle's explicit LEAST() end index."""
    from ethereum_etl_airflow_spark.functions.text import tokens_col

    d = _t(spark, sf_dir, "documents").select("doc_id", tokens_col().alias("toks"))
    e = d.select(
        "doc_id",
        "toks",
        F.size("toks").cast("long").alias("n_tok"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.size("toks").cast("long") - 1, F.lit(CHUNK_STRIDE).cast("long"))
        ).alias("start"),
    )
    return e.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("int").alias("chunk_id"),
        F.slice(F.col("toks"), F.col("start").cast("int") + 1, CHUNK_LEN).alias("chunk_tokens"),
        F.least(F.lit(CHUNK_LEN).cast("long"), F.col("n_tok") - F.col("start")).alias("chunk_len"),
        "n_tok",
    )


# ---------------------------------------------------------------------------
# Vocabulary tokenizer: words -> token ids via a learned top-V vocab
# (the "tokens payload" encode path — produces the (doc_id, tokens,
# n_tok) shape the CDC target table ingests).
# ---------------------------------------------------------------------------

#: vocabulary size for corpus_tokenize_vocab; id V = UNK
TOKENIZE_V = 50


@register(
    "corpus_tokenize_vocab",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), vocab AS (
        SELECT token,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) - 1 AS INT) AS tid
        FROM (
            SELECT token, COUNT(*) AS n FROM toks GROUP BY token
            ORDER BY n DESC, token ASC LIMIT {TOKENIZE_V}
        )
    ), words AS (
        SELECT doc_id, i AS pos, (string_split(text, ' '))[i] AS token
        FROM documents,
             unnest(range(1, len(string_split(text, ' ')) + 1)) AS t(i)
    )
    SELECT w.doc_id,
           list(COALESCE(v.tid, {TOKENIZE_V}) ORDER BY w.pos) AS tokens,
           CAST(COUNT(*) AS INT) AS n_tok
    FROM words w LEFT JOIN vocab v USING (token)
    GROUP BY w.doc_id
    """,
    doc=f"encode documents to token-id arrays with a learned top-{TOKENIZE_V} "
    "word vocabulary (OOV -> UNK id); output shape = the CDC target "
    "table's (doc_id, tokens, n_tok) contract",
    survey_ref="input_hint tokens payload; corpus_vocab_topk learn step + "
    "narrow broadcast-map encode",
)
def corpus_tokenize_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the vocab with one hash agg + TakeOrdered, then encode with
    a ZERO-shuffle narrow map: the vocab is bounded (V entries — a
    driver scalar by design, like the other bounded collects), so it
    broadcasts as a literal MAP and each doc encodes via
    ``transform(split(text), w -> coalesce(map[w], UNK))``. No explode,
    no regroup — at 100 TB the encode stage is a single scan-project
    with the vocabulary riding in the closure. A join-based encode
    (explode words -> join vocab -> re-assemble by position) would
    shuffle every token twice for the same result."""
    return _vocab_encode(spark, sf_dir)


def _vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tokens, n_tok) via the learned top-V vocabulary — the
    shared encode step (see :func:`corpus_tokenize_vocab` for the plan
    rationale; :func:`corpus_pack_emit` packs its output)."""
    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(TOKENIZE_V)
        .collect()
    )
    ranked = sorted(counts, key=lambda r: (-r["n"], r["token"]))
    pairs: list = []
    for tid, r in enumerate(ranked):
        pairs.extend([F.lit(r["token"]), F.lit(tid)])
    vocab_map = F.create_map(*pairs)
    toks = F.transform(
        F.split(F.col("text"), " "),
        lambda w: F.coalesce(
            F.element_at(vocab_map, w), F.lit(TOKENIZE_V)
        ).cast("int"),
    )
    return d.select(
        "doc_id",
        toks.alias("tokens"),
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )


#: the vocab-encode CTE chain shared by the tokenize and pack oracles
_ENCODE_CTES = f"""toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), vocab AS (
        SELECT token,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) - 1 AS INT) AS tid
        FROM (
            SELECT token, COUNT(*) AS n FROM toks GROUP BY token
            ORDER BY n DESC, token ASC LIMIT {TOKENIZE_V}
        )
    ), words AS (
        SELECT doc_id, i AS pos, (string_split(text, ' '))[i] AS token
        FROM documents,
             unnest(range(1, len(string_split(text, ' ')) + 1)) AS t(i)
    ), enc AS (
        SELECT w.doc_id,
               list(COALESCE(v.tid, {TOKENIZE_V}) ORDER BY w.pos) AS tokens,
               CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM words w LEFT JOIN vocab v USING (token)
        GROUP BY w.doc_id
    )"""


@register(
    "corpus_pack_emit",
    oracle=f"""
    WITH {_ENCODE_CTES}, ord AS (
        SELECT doc_id, tokens, n_tok,
               COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS start
        FROM enc
    ), win AS (
        SELECT *,
               CAST(start // {PACK_MAX_LEN} AS BIGINT) AS seq_id,
               MIN(start) OVER (PARTITION BY start // {PACK_MAX_LEN}) AS w0
        FROM ord
    )
    SELECT seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           flatten(list(tokens ORDER BY doc_id)) AS tokens,
           list(CAST(start - w0 AS INT) ORDER BY doc_id) AS boundaries
    FROM win
    GROUP BY seq_id
    """,
    doc=f"emit the packed training windows themselves: documents are "
    f"vocab-encoded (top-{TOKENIZE_V} word ids, OOV -> UNK), greedily "
    f"packed at {PACK_MAX_LEN}-token windows by global token offset, "
    "and each window materializes its concatenated token-id array plus "
    "the document-start offsets inside it (the attention-reset / "
    "loss-mask boundary list packed pretraining needs)",
    survey_ref="input_hint tokens payload: the batch-assembly stage on "
    "top of corpus_pack_sequences' window census — the consumer of "
    "corpus_tokenize_vocab's (doc_id, tokens, n_tok) contract",
)
def corpus_pack_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed windows with concatenated tokens + boundary offsets.

    Plan: the zero-shuffle vocab encode, the two-phase distributed
    prefix sum (per-block agg -> bounded driver cumsum -> broadcast
    back -> per-block window: no global sort, no single-partition
    funnel), then ONE shuffle on seq_id to assemble each window. The
    assembled arrays are window-bounded (~PACK_MAX_LEN ints plus one
    straddling tail), so collect_list stays O(window), never O(doc
    count). Boundary offsets are each member's global start minus the
    window's first start — computed from the sorted starts array, no
    second window function."""
    o = global_prefix_sum(
        _vocab_encode(spark, sf_dir), "doc_id", "n_tok", PACK_BLOCK
    )
    g = (
        o.withColumn("seq_id", F.expr(f"start div {PACK_MAX_LEN}"))
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.array_sort(F.collect_list(F.struct("doc_id", "tokens"))).alias(
                "ds"
            ),
            F.sort_array(F.collect_list("start")).alias("starts"),
        )
    )
    return g.select(
        "seq_id",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.flatten(F.transform("ds", lambda s: s["tokens"])).alias("tokens"),
        F.transform(
            "starts",
            lambda s: (s - F.element_at(F.col("starts"), 1)).cast("int"),
        ).alias("boundaries"),
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle: reproducible global training order as
# (shard, position) — the data-order half of reproducible training.
# ---------------------------------------------------------------------------

#: output shards for corpus_shuffle_shards (at 100 TB: pick so one
#: shard ~= one output file, e.g. corpus_bytes / 1 GB)
SHUFFLE_SHARDS = 8

#: epoch seed baked into the shuffle key — bump per training epoch for
#: a fresh but replayable order
SHUFFLE_SEED = "e0"


# ---------------------------------------------------------------------------
# Length-bucketed batch assembly: group docs of similar token length
# into fixed-token-budget batches, audit the padding waste per batch.
# ---------------------------------------------------------------------------

#: token budget per training batch
LENBUCKET_BUDGET = 256

#: deterministic shards per bucket (keeps the rank windows parallel —
#: there are only ~10 power-of-two caps, so without sharding every
#: same-length doc in a 100 TB corpus would funnel through one task)
LENBUCKET_SHARDS = 16

_CAP_STEPS = [8, 16, 32, 64, 128, 256, 512, 1024]
_CAP_ELSE = 2048


def _cap_case_sql(n_expr: str) -> str:
    whens = " ".join(
        f"WHEN {n_expr} <= {c} THEN {c}" for c in _CAP_STEPS
    )
    return f"CASE {whens} ELSE {_CAP_ELSE} END"


def _cap_case_col(n):
    expr = F.lit(_CAP_ELSE)
    for c in reversed(_CAP_STEPS):
        expr = F.when(n <= c, F.lit(c)).otherwise(expr)
    return expr


@register(
    "corpus_length_buckets",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ), b AS (
        SELECT doc_id, n_tok,
               {_cap_case_sql("n_tok")} AS cap,
               {phash60_sql("'lenbucket:' || CAST(doc_id AS VARCHAR)")}
                   % {LENBUCKET_SHARDS} AS shard
        FROM d
    ), r AS (
        SELECT cap, shard, n_tok,
               ROW_NUMBER() OVER (PARTITION BY cap, shard
                                  ORDER BY n_tok DESC, doc_id) AS rn,
               GREATEST(1, {LENBUCKET_BUDGET} // cap) AS rows_per_batch
        FROM b
    )
    SELECT cap AS bucket_cap,
           CAST(shard AS INT) AS shard,
           CAST((rn - 1) // rows_per_batch AS INT) AS batch_id,
           COUNT(*) AS n_rows,
           SUM(n_tok)::BIGINT AS sum_tok,
           (cap * COUNT(*) - SUM(n_tok))::BIGINT AS pad_tokens,
           CAST(SUM(n_tok) AS DOUBLE) / (cap * COUNT(*)) AS fill_frac
    FROM r
    GROUP BY cap, shard, (rn - 1) // rows_per_batch
    """,
    doc=f"length-bucketed training-batch assembly: power-of-two length "
    f"buckets, {LENBUCKET_BUDGET}-token batch budget, per-batch padding-"
    "waste audit (the dynamic-batching shape trainers use to cut pad "
    "FLOPs)",
    survey_ref="training-pipeline ops: the batch-shape dual of "
    "corpus_pack_sequences — packing concatenates docs into windows; "
    "length bucketing groups SIMILAR-length docs so per-batch padding "
    "is bounded by the bucket cap",
)
def corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket cap is a CASE chain (JVM codegen, no log2 floats — float
    discipline), shard is a seeded portable hash, and the in-bucket
    rank window partitions by (cap, shard) so batch numbering is both
    deterministic AND parallel: caps alone are ~10 partitions (a
    single-task funnel at 100 TB); caps x shards keeps every window
    task bounded at corpus/160-ish rows, and scaling LENBUCKET_SHARDS
    with the corpus keeps it flat. Everything after the window is one
    hash agg on (cap, shard, batch)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    b = d.select(
        "doc_id",
        "n_tok",
        _cap_case_col(F.col("n_tok")).alias("cap"),
        (
            phash60(F.concat(F.lit("lenbucket:"), F.col("doc_id").cast("string")))
            % LENBUCKET_SHARDS
        ).alias("shard"),
    )
    w = W.partitionBy("cap", "shard").orderBy(F.desc("n_tok"), "doc_id")
    r = b.select(
        "cap",
        "shard",
        "n_tok",
        F.row_number().over(w).alias("rn"),
        F.greatest(F.lit(1), F.expr(f"{LENBUCKET_BUDGET} div cap")).alias(
            "rows_per_batch"
        ),
    )
    return (
        r.withColumn("batch_id", F.expr("(rn - 1) div rows_per_batch").cast("int"))
        .groupBy(
            F.col("cap").alias("bucket_cap"),
            F.col("shard").cast("int").alias("shard"),
            "batch_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_tok").alias("sum_tok"),
        )
        .select(
            "bucket_cap",
            "shard",
            "batch_id",
            "n_rows",
            "sum_tok",
            (F.col("bucket_cap") * F.col("n_rows") - F.col("sum_tok")).alias(
                "pad_tokens"
            ),
            (
                F.col("sum_tok").cast("double")
                / (F.col("bucket_cap") * F.col("n_rows"))
            ).alias("fill_frac"),
        )
    )


@register(
    "corpus_shuffle_shards",
    oracle=f"""
    WITH k AS (
        SELECT doc_id,
               {phash60_sql("'shuffle:' || '" + SHUFFLE_SEED + "' || ':' || CAST(doc_id AS VARCHAR)")} AS skey
        FROM documents
    )
    SELECT doc_id,
           CAST(skey % {SHUFFLE_SHARDS} AS INT) AS shard,
           ROW_NUMBER() OVER (
               PARTITION BY skey % {SHUFFLE_SHARDS} ORDER BY skey, doc_id
           ) AS pos
    FROM k
    """,
    doc="deterministic seeded corpus shuffle: portable-hash order key -> "
    "shard assignment + in-shard position; same seed replays the exact "
    "training order on any engine",
    survey_ref="training-pipeline ops (reproducible data ordering); "
    "corpus_hash_split's keyed-hash discipline applied to ordering",
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order shuffle that replays bit-for-bit: the order key is
    a seeded portable hash of the doc id, the shard is key mod S, and
    the in-shard position is a rank window PARTITIONED BY SHARD — each
    shard sorts independently (Spark executes the window as exactly
    repartition(shard) + in-partition sort), so no global sort, no
    single-task bottleneck; S scales with corpus size to keep one shard
    ~= one output file. A global ROW_NUMBER would serialize 100 TB
    through one task; (shard, pos) carries the same information."""
    d = _t(spark, sf_dir, "documents")
    skey = phash60(
        F.concat(F.lit(f"shuffle:{SHUFFLE_SEED}:"), F.col("doc_id").cast("string"))
    )
    w = W.partitionBy(F.col("skey") % SHUFFLE_SHARDS).orderBy("skey", "doc_id")
    return (
        d.select("doc_id", skey.alias("skey"))
        .select(
            "doc_id",
            (F.col("skey") % SHUFFLE_SHARDS).cast("int").alias("shard"),
            F.row_number().over(w).alias("pos"),
            "skey",
        )
        .drop("skey")
    )


#: leakage fingerprint = first-K-token content prefix (the blocking key
#: family of text_fingerprint): exact-text fps would only catch
#: byte-identical leaks; the prefix catches the planted near-dups too.
#: Production composes this with the MinHash CLUSTER id
#: (dedup_cluster_canonical) as the fp for full near-dup leakage.
_LEAK_PREFIX = 12


@register(
    "split_leakage_report",
    oracle=f"""
    WITH s AS (
        SELECT CASE
                 WHEN {phash60_sql('doc_id::VARCHAR')} % 100 < 80 THEN 'train'
                 WHEN {phash60_sql('doc_id::VARCHAR')} % 100 < 90 THEN 'val'
                 ELSE 'test'
               END AS split,
               {phash60_sql(
                   "array_to_string(string_split(text, ' ')[1:" + str(_LEAK_PREFIX) + "], ' ')"
               )} AS fp
        FROM documents
    ), g AS (
        SELECT fp,
               MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
               MAX(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS in_val,
               MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test
        FROM s GROUP BY fp
    )
    SELECT COUNT(*)::BIGINT AS n_fingerprints,
           SUM(in_train * in_val)::BIGINT AS leak_train_val,
           SUM(in_train * in_test)::BIGINT AS leak_train_test,
           SUM(in_val * in_test)::BIGINT AS leak_val_test,
           SUM(CASE WHEN in_train + in_val + in_test >= 2 THEN 1 ELSE 0 END)
               ::BIGINT AS n_leaked
    FROM g
    """,
    doc="train/val/test contamination audit: content-prefix fingerprints "
    "shared across hash-split boundaries (a doc duplicated under two "
    "doc_ids can straddle splits even though the split itself is "
    "deterministic) — the release gate run before every corpus publish",
    survey_ref="training-pipeline ops (decontamination family; split "
    "sibling corpus_hash_split, external-testset sibling "
    "decontaminate_ngram_overlap)",
)
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One narrow map (split + fingerprint), ONE fingerprint-keyed
    map-side-combined agg (3 bit flags wide), and a scalar roll-up —
    the leak check costs one shuffle of (fp, 3 bits) regardless of
    corpus width. Key-hash splits are stable, but key-level splitting
    cannot see content duplicated under different keys — exactly what
    this audit counts."""
    from ethereum_etl_airflow_spark.functions.text import tokens_col

    d = _t(spark, sf_dir, "documents")
    bucket = phash60(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    fp = phash60(F.array_join(F.slice(tokens_col(), 1, _LEAK_PREFIX), " "))
    s = d.select(split.alias("split"), fp.alias("fp"))
    flag = lambda name: F.max(  # noqa: E731
        F.when(F.col("split") == name, 1).otherwise(0)
    ).alias(f"in_{name}")
    g = s.groupBy("fp").agg(flag("train"), flag("val"), flag("test"))
    return g.agg(
        F.count("*").alias("n_fingerprints"),
        F.sum(F.col("in_train") * F.col("in_val")).alias("leak_train_val"),
        F.sum(F.col("in_train") * F.col("in_test")).alias("leak_train_test"),
        F.sum(F.col("in_val") * F.col("in_test")).alias("leak_val_test"),
        F.sum(
            F.when(
                F.col("in_train") + F.col("in_val") + F.col("in_test") >= 2, 1
            ).otherwise(0)
        ).alias("n_leaked"),
    )


@register(
    "corpus_temperature_weights",
    oracle="""
    WITH n AS (
        SELECT source,
               SUM(len(list_filter(string_split(text, ' '),
                                   x -> x <> '')))::BIGINT AS n_tokens
        FROM documents GROUP BY 1
    ), w AS (
        SELECT source, n_tokens,
               CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT) AS weight
        FROM n
    )
    SELECT source, n_tokens, weight,
           CAST(weight AS DOUBLE)
               / CAST((SELECT SUM(weight) FROM w) AS DOUBLE) AS sample_prob
    FROM w
    """,
    doc="temperature-sampled mixture weights (alpha = 1/2, the "
    "multilingual-LM rebalancing rule: sample probability proportional "
    "to size^alpha so small sources are upweighted): per-source token "
    "counts, INTEGER sqrt weights (floor of the correctly-rounded IEEE "
    "sqrt — both engines agree bit-for-bit), and sample_prob as one "
    "IEEE divide of two exact integers — the denominator is an integer "
    "sum, so no float accumulation order exists to drift",
    survey_ref="tokens-axis mixture design (Conneau & Lample 2019 "
    "exponential-smoothing sampling; used by XLM-R/mT5 — public "
    "literature); feeds corpus_mixture_upsample's repeat factors",
)
def corpus_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One map-side-combined agg to source grain (a handful of rows),
    then the total rides back as a 1-row broadcast. The alpha=1/2
    power is computed in INTEGER space (floor-sqrt) precisely so the
    normalizing sum is exact — a float-weight sum would make
    sample_prob depend on aggregation order."""
    d = _t(spark, sf_dir, "documents")
    ntok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    n = d.groupBy("source").agg(
        F.sum(ntok).cast("long").alias("n_tokens")
    )
    w = n.select(
        "source",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")))
        .cast("long")
        .alias("weight"),
    ).localCheckpoint()
    tot = w.agg(F.sum("weight").alias("tw"))
    return w.join(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "weight",
        (F.col("weight").cast("double") / F.col("tw").cast("double")).alias(
            "sample_prob"
        ),
    )


@register(
    "tokens_vocab_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), vocab AS (
        SELECT token FROM (
            SELECT token, COUNT(*) AS n FROM toks GROUP BY token
            ORDER BY n DESC, token ASC LIMIT {TOKENIZE_V}
        )
    ), vl AS (
        SELECT list(token) AS arr FROM vocab
    ), per_src AS (
        SELECT d.source,
               SUM(len(list_filter(string_split(d.text, ' '),
                   w -> NOT list_contains(vl.arr, w))))::BIGINT AS oov_tokens,
               SUM(len(string_split(d.text, ' ')))::BIGINT AS total_tokens
        FROM documents d, vl GROUP BY d.source
    )
    SELECT source, total_tokens, oov_tokens,
           CAST(oov_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS oov_rate
    FROM per_src
    """,
    doc=f"vocabulary coverage audit: per-source OOV token counts and "
    f"rate against the learned top-{TOKENIZE_V} vocab — the "
    "acceptance gate for a tokenizer on a mixed-source corpus (a "
    "source with a high OOV rate degrades to UNK soup under "
    "corpus_tokenize_vocab's encode); pairs with "
    "tokenizer_fertility_stats as the vocab-selection diagnostics",
    survey_ref="tokens payload (input_hint): coverage audit of the "
    "corpus_tokenize_vocab encode contract; one exact integer ratio "
    "(single IEEE divide of two exact longs, same on both engines)",
)
def tokens_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: the vocab is the same bounded top-V collect the encode
    uses (driver scalar by design); coverage is then ONE narrow map
    (per-doc OOV count via a literal-array membership filter) + one
    <=|sources|-key aggregate — no explode, no join, one shuffle."""
    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(TOKENIZE_V)
        .collect()
    )
    vocab_arr = F.array(*[F.lit(r["token"]) for r in counts])
    ws = F.split(F.col("text"), " ")
    oov = F.size(F.filter(ws, lambda w: ~F.array_contains(vocab_arr, w)))
    per_src = d.groupBy("source").agg(
        F.sum(F.size(ws)).cast("long").alias("total_tokens"),
        F.sum(oov).cast("long").alias("oov_tokens"),
    )
    return per_src.select(
        "source",
        "total_tokens",
        "oov_tokens",
        (
            F.col("oov_tokens").cast("double") / F.col("total_tokens").cast("double")
        ).alias("oov_rate"),
    )
