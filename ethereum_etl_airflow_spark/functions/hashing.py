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
