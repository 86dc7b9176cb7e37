"""Multimodal column handling: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted through Arrow-batched pandas UDFs.

Pattern (the production shape for image/audio/video at 100 TB):

* media lives in a ``binary`` column next to typed metadata
  (``media_type``, ``n_bytes``); Spark never interprets the bytes —
  parquet stores them as BYTE_ARRAY, column pruning skips them unless
  the query touches them;
* decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages: Arrow moves each partition into pandas in
  zero-copy batches (``spark.sql.execution.arrow.maxRecordsPerBatch``
  controls batch shape), numpy does the per-batch work — NO per-row
  Python;
* the pipeline is a narrow map — no shuffle; partition count = scan
  parallelism, so 1000 executors decode 1000 partitions concurrently.

The sandbox has no image/audio codecs, so ``decode_media`` is a
DETERMINISTIC FAKE (clearly marked): it parses a fake header from the
leading bytes and computes numpy reductions over the payload. The
Spark-side plumbing — binary schema, Arrow batching, UDF signatures,
output schemas — is the real thing, and the fake's arithmetic is
mirrored exactly by the DuckDB oracle (byte values via ascii()), so
even the UDF path is value-checked end-to-end.

Swapping in a real codec: replace ``_fake_decode_np`` with
PIL/torchvision/librosa calls inside the same ``mapInPandas`` body
(import-guarded — ``decode_media_real`` below raises
``NotImplementedError`` until the codec libs exist in the image).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ethereum_etl_airflow_spark.queries import _t, register

HEADER_LEN = 8
FRAME_BYTES = 128

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_sum", T.LongType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal source: documents re-materialized as an opaque
    binary payload + typed metadata (the schema a real corpus would
    have; here the bytes are the utf-8 text so the oracle can reason
    about them)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.lit("fake/raw").alias("media_type"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )


def _fake_decode_np(buf: bytes) -> tuple[int, int, int, int]:
    """DETERMINISTIC FAKE decode — stands in for an image codec.
    Parses a 'header' (first HEADER_LEN bytes) and reduces the payload
    with numpy. Replace with a real codec via decode_media_real."""
    import numpy as np

    a = np.frombuffer(buf, dtype=np.uint8)
    head = a[:HEADER_LEN].astype(np.int64)
    header_sum = int(head.sum())
    fake_w = 32 + int(head[0]) % 64 if len(head) > 0 else 0
    fake_h = 32 + int(head[1]) % 64 if len(head) > 1 else 0
    checksum = int(a.astype(np.int64).sum()) % 65536
    return header_sum, fake_w, fake_h, checksum


def decode_media_real(*_args, **_kwargs):  # pragma: no cover
    """Placeholder for the real codec path (PIL / torchvision /
    librosa are not installed in this image)."""
    raise NotImplementedError(
        "real media decoding requires codec libraries not present in "
        "this environment; use decode_media (deterministic fake)"
    )


def decode_media(media_df: DataFrame) -> DataFrame:
    """binary -> per-media features via ONE mapInPandas stage (narrow,
    Arrow-batched; numpy inside the batch, no per-row Python).

    The closure is self-contained (no references back into this
    module) so cloudpickle ships it by value — workers need no
    importable copy of the package."""
    header_len = HEADER_LEN

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        def fake_decode(buf: bytes):
            a = np.frombuffer(buf, dtype=np.uint8)
            head = a[:header_len].astype(np.int64)
            return (
                int(head.sum()),
                32 + int(head[0]) % 64 if len(head) > 0 else 0,
                32 + int(head[1]) % 64 if len(head) > 1 else 0,
                int(a.astype(np.int64).sum()) % 65536,
            )

        for pdf in batches:
            feats = [fake_decode(b) for b in pdf["media"]]
            out = pd.DataFrame(
                feats, columns=["header_sum", "fake_width", "fake_height", "checksum"]
            )
            out.insert(0, "n_bytes", pdf["media"].str.len().values)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media_df.mapInPandas(run, DECODE_SCHEMA)


def frame_sample(media_df: DataFrame, frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """binary -> one row per FRAME_BYTES window (the video frame-sample
    shape: mapInPandas may return MORE rows than it received — a
    vectorized flat-map)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            doc_ids, idxs, sizes, sums = [], [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                a = np.frombuffer(buf, dtype=np.uint8)
                for fi in range(0, (len(a) + frame_bytes - 1) // frame_bytes):
                    w = a[fi * frame_bytes : (fi + 1) * frame_bytes]
                    doc_ids.append(doc_id)
                    idxs.append(fi)
                    sizes.append(len(w))
                    sums.append(int(w.astype(np.int64).sum()) % 256)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": idxs,
                    "frame_bytes": sizes,
                    "frame_checksum": sums,
                }
            )

    return media_df.mapInPandas(run, FRAME_SCHEMA)


_BYTESUM_SQL = "list_sum(list_transform(generate_series(1, {n}), i -> ascii(substr(text, {off} + i, 1))))"


@register(
    "multimodal_decode_stats",
    oracle=f"""
    SELECT doc_id,
           'fake/raw' AS media_type,
           strlen(text)::BIGINT AS n_bytes,
           {_BYTESUM_SQL.format(n=HEADER_LEN, off=0)}::BIGINT AS header_sum,
           (32 + ascii(substr(text, 1, 1)) % 64)::BIGINT AS fake_width,
           (32 + ascii(substr(text, 2, 1)) % 64)::BIGINT AS fake_height,
           ({_BYTESUM_SQL.format(n='strlen(text)', off=0)} % 65536)::BIGINT AS checksum
    FROM documents
    """,
    doc="binary media decode via Arrow mapInPandas (fake codec, checked math)",
    survey_ref="training-pipeline ops (multimodal decode); F1-F3 vectorized-UDF discipline",
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_media(media_table(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, strlen(text) AS n FROM documents
    ), f AS (
        SELECT doc_id, text, n, unnest(generate_series(0, ((n + {FRAME_BYTES} - 1) // {FRAME_BYTES}) - 1)) AS frame_idx
        FROM t
    )
    SELECT doc_id, frame_idx,
           least({FRAME_BYTES}, n - frame_idx * {FRAME_BYTES})::BIGINT AS frame_bytes,
           (list_sum(list_transform(
                generate_series(1, least({FRAME_BYTES}, n - frame_idx * {FRAME_BYTES})::BIGINT),
                i -> ascii(substr(text, frame_idx * {FRAME_BYTES} + i, 1)))) % 256)::BIGINT AS frame_checksum
    FROM f
    """,
    doc="video-style frame sampling: vectorized flat-map over binary windows",
    survey_ref="training-pipeline ops (frame-sample); mapInPandas flat-map shape",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(media_table(spark, sf_dir))


WINDOW_BYTES = 64

ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_windows", T.LongType()),
        T.StructField("total_energy", T.LongType()),
        T.StructField("peak_energy", T.LongType()),
    ]
)


def audio_energy(media_df: DataFrame, window_bytes: int = WINDOW_BYTES) -> DataFrame:
    """binary -> per-media windowed energy features (the audio
    feature-extract shape: samples -> fixed windows -> sum-of-squares
    per window -> per-media reduction, all INSIDE one Arrow batch —
    the window fan-out never leaves the kernel, unlike frame_sample's
    deliberate flat-map). Exact int64 math so the oracle reproduces it
    bit-for-bit; swap the u8 read for int16 PCM + a real windowing fn
    when codec libs exist (decode_media_real pattern)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                a = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
                pad = (-len(a)) % window_bytes
                if pad:
                    a = np.concatenate([a, np.zeros(pad, dtype=np.int64)])
                w = (a * a).reshape(-1, window_bytes).sum(axis=1)
                rows.append(
                    (doc_id, len(w), int(w.sum()), int(w.max()) if len(w) else 0)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_windows", "total_energy", "peak_energy"]
            )

    return media_df.mapInPandas(run, ENERGY_SCHEMA)


@register(
    "multimodal_audio_energy",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, strlen(text) AS n FROM documents
    ), w AS (
        SELECT doc_id, text, n,
               unnest(generate_series(0, ((n + {WINDOW_BYTES} - 1) // {WINDOW_BYTES}) - 1)) AS wi
        FROM t
    ), e AS (
        SELECT doc_id, wi,
               list_sum(list_transform(
                   generate_series(1, least({WINDOW_BYTES}, n - wi * {WINDOW_BYTES})::BIGINT),
                   i -> ascii(substr(text, wi * {WINDOW_BYTES} + i, 1))
                        * ascii(substr(text, wi * {WINDOW_BYTES} + i, 1)))) AS en
        FROM w
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_windows,
           sum(en)::BIGINT AS total_energy,
           max(en)::BIGINT AS peak_energy
    FROM e GROUP BY doc_id
    """,
    doc="audio-style windowed energy extraction: fixed sample windows, "
    "exact-int sum-of-squares per window, per-media reduction inside "
    "ONE Arrow kernel (zero-shuffle narrow map)",
    survey_ref="training-pipeline ops (multimodal feature-extract verb; "
    "decode and frame-sample are the sibling kernels)",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_energy(media_table(spark, sf_dir))


BLOCKS = 60  # 60-bit hash: the phash60 house width (positive int64)

BLOCKHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("blockhash", T.LongType()),
    ]
)


def blockhash_media(media_df: DataFrame, nblocks: int = BLOCKS) -> DataFrame:
    """binary -> 60-bit blockhash (public 'Blockhash' perceptual-hash
    scheme reduced to 1-D: split the payload into equal byte blocks,
    bit_i = block i's byte-sum above the per-item mean). The compare
    against the mean is the exact integer cross-multiplication
    ``nblocks * block_sum > total`` — no float mean exists. ONE
    mapInPandas stage, numpy cumsum per batch; with a real image
    codec the same body hashes decoded luma planes instead of raw
    bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, hashes = [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                a = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
                csum = np.concatenate(([0], np.cumsum(a)))
                bounds = (np.arange(nblocks + 1) * len(a)) // nblocks
                bsum = csum[bounds[1:]] - csum[bounds[:-1]]
                bits = (nblocks * bsum > csum[-1]).astype(np.int64)
                ids.append(doc_id)
                hashes.append(int((bits << np.arange(nblocks)).sum()))
            yield pd.DataFrame({"doc_id": ids, "blockhash": hashes})

    return media_df.mapInPandas(run, BLOCKHASH_SCHEMA)


@register(
    "multimodal_blockhash_dedup",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, strlen(text) AS n FROM documents
    ), e AS (
        SELECT doc_id, text, n, unnest(range({BLOCKS})) AS i FROM t
    ), s AS (
        SELECT doc_id, i,
               COALESCE(list_sum(list_transform(
                   generate_series((i * n) // {BLOCKS} + 1,
                                   ((i + 1) * n) // {BLOCKS}),
                   p -> ascii(substr(text, p, 1)))), 0)::BIGINT AS bsum
        FROM e
    ), s2 AS (
        SELECT doc_id, i, bsum,
               SUM(bsum) OVER (PARTITION BY doc_id) AS total
        FROM s
    ), h AS (
        SELECT doc_id,
               SUM(CASE WHEN {BLOCKS} * bsum > total
                        THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS blockhash
        FROM s2 GROUP BY doc_id
    )
    SELECT doc_id, blockhash,
           (COUNT(*) OVER (PARTITION BY blockhash) >= 2) AS is_dup
    FROM h
    """,
    doc="perceptual near-dup hash for opaque media: 60-bit blockhash "
    "(equal byte blocks, bit = block sum above the item mean via the "
    "exact cross-multiplied compare), then hash-collision dup flags — "
    "the image-dedup pass of a multimodal corpus, byte math oracle-"
    "checked end to end",
    survey_ref="training-pipeline multimodal family (task brief): "
    "dedup leg beside decode/frame-sample/audio-energy; public "
    "Blockhash scheme (Yang et al., blockhash.io) reduced to 1-D; "
    "hash width matches functions/hashing.phash60 discipline",
)
def multimodal_blockhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: ONE narrow Arrow stage computes every hash (no shuffle,
    partition-parallel), then a single exchange on blockhash for the
    collision counts. At 10^9 media items the hash stage scales with
    scan parallelism; the collision window touches 8-byte rows only."""
    from pyspark.sql import Window as W

    hashed = blockhash_media(media_table(spark, sf_dir))
    w = W.partitionBy("blockhash")
    return hashed.select(
        "doc_id",
        "blockhash",
        (F.count("*").over(w) >= 2).alias("is_dup"),
    )
