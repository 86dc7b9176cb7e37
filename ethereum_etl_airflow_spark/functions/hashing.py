"""Portable deterministic hashing — identical in Spark and DuckDB.

The engine's internal hot-path hash is ``xxhash64`` (JVM codegen, used
for bucket salting — sinks/snapshot_table.bucket_expr). For operators
whose results must be replayed bit-for-bit by the DuckDB oracle
(dedup fingerprints, MinHash permutations, LSH planes), we need a hash
BOTH engines compute identically: the first 60 bits of md5, parsed
big-endian.

    Spark :  conv(substring(md5(x), 1, 15), 16, 10) :: long
    DuckDB:  ('0x' || substr(md5(x), 1, 15)) :: BIGINT

60 bits keeps the value strictly positive in a signed 64-bit int, so
``%`` behaves identically in both engines (no negative-mod divergence).

MinHash permutation family (universal-hash style):

    h_i(x) = (a_i * (phash(x) % P) + b_i) % P,
    P = 1_000_000_007,  a_i = 2 i + 1,  b_i = 7919 (i + 1)

a_i <= 2K keeps products < 2^35 — no 64-bit overflow in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for MinHash permutations (prime, ~2^30)
MINHASH_P = 1_000_000_007


def phash60(col: Column) -> Column:
    """Portable 60-bit positive hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def phash60_sql(expr: str) -> str:
    """Same hash as :func:`phash60`, as a DuckDB SQL fragment."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_perm(x: Column, i: int) -> Column:
    """i-th MinHash permutation applied to a phash60 value (Spark side)."""
    return (F.lit(2 * i + 1) * (x % MINHASH_P) + F.lit(7919 * (i + 1))) % MINHASH_P


def minhash_perm_sql(x_expr: str, i_expr: str) -> str:
    """MinHash permutation as a DuckDB fragment (``i_expr`` may be a
    lambda variable, e.g. inside list_transform over generate_series)."""
    return (
        f"(((2*{i_expr}+1) * ({x_expr} % {MINHASH_P}) + 7919*({i_expr}+1)) % {MINHASH_P})"
    )


# ---------------------------------------------------------------------------
# Driver-side XXH64 — bit-identical to Spark's ``xxhash64`` expression.
#
# Spark's XXH64 (common/unsafe XXH64.java) is a faithful port of the
# public xxHash-64 algorithm (Yann Collet, BSD-2; little-endian lane
# reads), seeded with 42 and chained across arguments: for
# ``xxhash64(c1, c2)`` the hash of c1 becomes the seed for c2. String
# columns hash their UTF-8 bytes; IntegerType arguments hash their
# 4-byte little-endian form, LongType their 8-byte form.
#
# Having the same function on the driver lets point lookups compute
# hash buckets and Bloom probe positions WITHOUT launching a Spark job
# (a whole job per lookup otherwise). Parity with the JVM expression is
# asserted in tests/test_hashing_parity.py over random inputs.
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1
_XP1 = 0x9E3779B185EBCA87
_XP2 = 0xC2B2AE3D27D4EB4F
_XP3 = 0x165667B19E3779F9
_XP4 = 0x85EBCA77C2B2AE63
_XP5 = 0x27D4EB2F165667C5

#: Spark's XxHash64 default seed (catalyst hash.scala)
SPARK_XXHASH_SEED = 42


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xx_avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h


def xxhash64_bytes(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """Unsigned XXH64 of ``data`` (standard algorithm, LE lanes)."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XP1 + _XP2) & _M64
        v2 = (seed + _XP2) & _M64
        v3 = seed
        v4 = (seed - _XP1) & _M64
        while i + 32 <= n:
            v1 = (_rotl64((v1 + int.from_bytes(data[i:i + 8], "little") * _XP2) & _M64, 31) * _XP1) & _M64
            v2 = (_rotl64((v2 + int.from_bytes(data[i + 8:i + 16], "little") * _XP2) & _M64, 31) * _XP1) & _M64
            v3 = (_rotl64((v3 + int.from_bytes(data[i + 16:i + 24], "little") * _XP2) & _M64, 31) * _XP1) & _M64
            v4 = (_rotl64((v4 + int.from_bytes(data[i + 24:i + 32], "little") * _XP2) & _M64, 31) * _XP1) & _M64
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XP2) & _M64, 31) * _XP1) & _M64
            h = (h * _XP1 + _XP4) & _M64
    else:
        h = (seed + _XP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k1 = (_rotl64((int.from_bytes(data[i:i + 8], "little") * _XP2) & _M64, 31) * _XP1) & _M64
        h = (_rotl64(h ^ k1, 27) * _XP1 + _XP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _XP1) & _M64
        h = (_rotl64(h, 23) * _XP2 + _XP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XP5) & _M64
        h = (_rotl64(h, 11) * _XP1) & _M64
        i += 1
    return _xx_avalanche(h)


def _to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


class i64(int):
    """Operand explicitly marked as a Spark ``LongType`` value.

    JVM hashing is TYPE-driven, not value-driven: ``xxhash64`` over a
    ``bigint`` column consumes 8 bytes even for small magnitudes, while
    an ``int`` column consumes 4.  Wrap driver-side literals destined
    for a LongType comparison in ``i64(...)`` to force the 8-byte path.
    """


def spark_xxhash64(*values) -> int:
    """Driver-side equivalent of ``F.xxhash64(*cols)`` for str / 32-bit
    int / 64-bit int literals, returned SIGNED like the JVM column.

    A plain ``int`` follows IntegerType semantics when it fits 32 bits
    (value-driven fallback, kept for parity-test coverage of the int
    path); use :class:`i64` to pin LongType semantics regardless of
    magnitude — the JVM hashes by column type, not value.
    """
    h = SPARK_XXHASH_SEED
    for v in values:
        if isinstance(v, str):
            h = xxhash64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, bool):
            raise TypeError("bool hashing not mapped")
        elif isinstance(v, i64):
            h = xxhash64_bytes(v.to_bytes(8, "little", signed=True), h)
        elif isinstance(v, int):
            width = 4 if -(1 << 31) <= v < (1 << 31) else 8
            h = xxhash64_bytes(v.to_bytes(width, "little", signed=True), h)
        else:
            raise TypeError(f"unsupported xxhash64 operand type {type(v)!r}")
    return _to_signed64(h)


def bucket_of(doc_id, num_buckets: int) -> int:
    """Driver-side twin of ``sinks.snapshot_table.bucket_expr`` —
    ``pmod(xxhash64(doc_id), num_buckets)`` (Python ``%`` on a positive
    modulus IS Java pmod).

    Integer keys are hashed with LongType semantics: every integral id
    column in this engine (and in Spark DataFrames built from Python
    ints) is ``bigint``, and the JVM hashes the full 8 bytes even for
    small values — a value-width heuristic would silently probe the
    wrong bucket for keys < 2^31.
    """
    if isinstance(doc_id, int) and not isinstance(doc_id, bool):
        doc_id = i64(doc_id)
    return spark_xxhash64(doc_id) % num_buckets
