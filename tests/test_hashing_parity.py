"""Driver-side XXH64 must be bit-identical to Spark's xxhash64
expression — it replaces a whole Spark job per point lookup
(SnapshotTable.lookup bucket pruning + Bloom probes,
SecondaryIndex.lookup)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.hashing import (
    bucket_of,
    spark_xxhash64,
    xxhash64_bytes,
)


def _spark_hashes(spark, rows, exprs):
    df = spark.createDataFrame(rows, "s string, i int")
    return [r["h"] for r in df.select(exprs.alias("h")).collect()]


def test_xxhash64_string_parity(spark):
    rng = random.Random(7)
    # lengths straddle every code path: empty, <4, <8, 8..31, >=32, long
    samples = [""]
    for n in (1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 100, 1000):
        samples.append("".join(chr(rng.randrange(32, 0x2FF)) for _ in range(n)))
    samples += ["doc-42", "user\x00null", "héllo wörld", "\U0001f600" * 10]
    rows = [(s, 0) for s in samples]
    jvm = _spark_hashes(spark, rows, F.xxhash64("s"))
    py = [spark_xxhash64(s) for s in samples]
    assert py == jvm


def test_xxhash64_chained_string_int_parity(spark):
    rng = random.Random(11)
    rows = [
        ("".join(chr(rng.randrange(97, 123)) for _ in range(rng.randrange(0, 40))), rng.randrange(-(2**31), 2**31 - 1))
        for _ in range(50)
    ] + [("seedcase", 1), ("seedcase", 2), ("seedcase", 3)]
    jvm = _spark_hashes(spark, rows, F.xxhash64("s", "i"))
    py = [spark_xxhash64(s, i) for s, i in rows]
    assert py == jvm


def test_bucket_of_matches_bucket_expr(spark):
    from ethereum_etl_airflow_spark.sinks.snapshot_table import bucket_expr

    keys = [f"doc{i:05d}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id string")
    jvm = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", bucket_expr(F.col("doc_id"), 16).alias("b")).collect()
    }
    for k in keys:
        assert bucket_of(k, 16) == jvm[k]


def test_xxhash64_long_column_parity(spark):
    """A bigint column hashes 8 bytes even for small values — the
    driver-side twin must match via the i64 marker (type-driven, not
    value-driven, hashing)."""
    from ethereum_etl_airflow_spark.functions.hashing import i64

    vals = [0, 1, -1, 5, 2**31 - 1, -(2**31), 2**31, 2**40, -(2**40), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(v,) for v in vals], "l long")
    jvm = [r["h"] for r in df.select(F.xxhash64("l").alias("h")).collect()]
    py = [spark_xxhash64(i64(v)) for v in vals]
    assert py == jvm


def test_bucket_of_long_keys_match_bucket_expr(spark):
    """bucket_of on integer keys must agree with bucket_expr over the
    bigint column Spark infers for Python ints — including small
    magnitudes where a value-width heuristic would hash 4 bytes."""
    from ethereum_etl_airflow_spark.sinks.snapshot_table import bucket_expr

    keys = list(range(50)) + [2**31, 2**40, -7, 2**63 - 1]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    jvm = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", bucket_expr(F.col("doc_id"), 16).alias("b")).collect()
    }
    for k in keys:
        assert bucket_of(k, 16) == jvm[k]


def test_xxhash64_bytes_known_vectors():
    # xxHash reference vectors (xxhsum: XXH64 of b"" seed 0, b"a" etc.)
    assert xxhash64_bytes(b"", 0) == 0xEF46DB3751D8E999
    assert xxhash64_bytes(b"xxhash", 0) == 0x32DD38952C4BC720
