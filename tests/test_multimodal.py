"""Multimodal plumbing tests: binary schema, Arrow batch shape,
flat-map expansion, and the stubbed real-codec path."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from ethereum_etl_airflow_spark.functions.multimodal import (
    FRAME_BYTES,
    decode_media,
    decode_media_real,
    frame_sample,
    media_table,
)

SF = "/root/testdata/sf0.001"


def test_media_table_schema(spark):
    m = media_table(spark, SF)
    assert isinstance(m.schema["media"].dataType, T.BinaryType)
    row = m.first()
    assert row.n_bytes == len(row.media)
    assert row.media_type == "fake/raw"


def test_decode_media_features_consistent(spark):
    m = media_table(spark, SF)
    out = decode_media(m)
    rows = out.collect()
    assert len(rows) == m.count()  # 1:1 map
    for r in rows[:20]:
        assert 32 <= r.fake_width < 96
        assert 0 <= r.checksum < 65536


def test_frame_sample_flatmap_counts(spark):
    m = media_table(spark, SF)
    frames = frame_sample(m).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r.doc_id, []).append(r)
    for row in m.select("doc_id", "n_bytes").collect():
        want = (row.n_bytes + FRAME_BYTES - 1) // FRAME_BYTES
        got = per_doc[row.doc_id]
        assert len(got) == want
        # frame sizes: all full except possibly the last
        sizes = [f.frame_bytes for f in sorted(got, key=lambda f: f.frame_idx)]
        assert all(s == FRAME_BYTES for s in sizes[:-1])
        assert sum(sizes) == row.n_bytes


def test_real_codec_path_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media_real()
