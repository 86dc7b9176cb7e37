"""Corpus-hygiene operators (functions/decontam.py): benchmark
decontamination, repetition signals, SimHash near-dup banding.

The headline guarantee tested here is the banding LOSSLESSNESS claim:
4 disjoint 15-bit bands over a 60-bit SimHash must surface every pair
within hamming distance 3 (pigeonhole) — verified against a
brute-force all-pairs hamming scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.decontam import (
    BENCH_MOD,
    HAMMING_MAX,
    SIMHASH_BITS,
    decontaminate_ngram_overlap,
    simhash_near_dup_pairs,
    text_repetition_stats,
)
from ethereum_etl_airflow_spark.functions.fingerprint import ngrams_col, simhash_expr
from ethereum_etl_airflow_spark.functions.hashing import phash60
from tests.conftest import SF_SMOKE


def test_banding_is_lossless_vs_bruteforce(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sig = simhash_expr(
        F.transform(F.split("text", " "), lambda x: phash60(x)), SIMHASH_BITS
    )
    sigs = {r["doc_id"]: r["sh"] for r in d.select("doc_id", sig.alias("sh")).collect()}
    ids = sorted(sigs)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= HAMMING_MAX
    }
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_pairs(spark, SF_SMOKE).collect()
    }
    assert banded == brute
    assert brute, "fixture corpus should contain near-dup pairs"


def test_decontam_excludes_benchmark_docs(spark):
    rows = decontaminate_ngram_overlap(spark, SF_SMOKE).collect()
    assert rows, "fixture corpus should contain contaminated docs"
    for r in rows:
        assert r["doc_id"] % BENCH_MOD != 0
        assert 1 <= r["n_hits"] <= r["n_grams"]
        assert 0.0 < r["contamination_frac"] <= 1.0


def test_ngrams_col_known_values(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("x y",), ("solo",)], ["text"]
    ).select(ngrams_col(F.split("text", " "), 3).alias("g"))
    got = [r["g"] for r in df.collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []  # shorter than n -> empty, not a descending sequence
    assert got[2] == []


def test_repetition_stats_known_doc(spark, tmp_path):
    spark.createDataFrame(
        [(1, "a b a b c", "en", "web", 9), (2, "q", "en", "web", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r for r in text_repetition_stats(spark, str(tmp_path)).collect()}
    r = rows[1]
    # bigrams of "a b a b c": [a b, b a, a b, b c]
    assert (r["n_2gram"], r["n_uniq_2gram"], r["top_2gram_cnt"]) == (4, 3, 2)
    assert r["dup_2gram_frac"] == 0.25
    assert r["top_2gram_frac"] == 0.5
    assert 2 not in rows  # single-token doc has no bigrams
