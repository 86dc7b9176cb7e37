"""Leaf vector-arithmetic helpers shared by the similarity / ANN
operator modules (``similarity.py``, ``ivf.py``).

Import-graph rule: registration modules (the ones that call
``queries.register`` at import time) must NOT import NAMES from each
other at module top level — module A importing B while B is importing
``queries`` (which imports A...) leaves B partially initialized and
the name lookup fails depending on which module a Spark Python worker
happens to import first. Shared pieces therefore live in leaf modules
like this one that depend only on pyspark.

Numeric discipline (see similarity.py's module docstring for the full
story): float32 embeddings are scaled to exact integers, dot products
and norms are 64-bit-integer exact, and the DuckDB SQL twins compute
bit-identical values.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

DIM = 64
SCALE = 1_000_000
COS_THRESHOLD_SQ_X10000 = 2025  # tau = 0.45 -> tau^2 * 10^4
N_PLANES = 8
TOP_K = 5
N_QUERIES = 10


def _plane_sign(p: int, i: int) -> int:
    """Deterministic pseudo-random hyperplane component in {-1, +1}
    (same md5-derived discipline as functions/hashing.phash60)."""
    h = hashlib.md5(f"pl{p}-{i}".encode()).hexdigest()
    return 1 if int(h[:15], 16) % 2 == 1 else -1


PLANES = [[_plane_sign(p, i) for i in range(DIM)] for p in range(N_PLANES)]


def _planes_sql() -> str:
    rows = ", ".join(
        "[" + ", ".join(str(s) for s in plane) + "]" for plane in PLANES
    )
    return f"[{rows}]"


def int_vec(emb=None):
    """float32 array -> exact scaled int64 array."""
    emb = F.col("embedding") if emb is None else emb
    return F.transform(emb, lambda x: F.floor(x.cast("double") * SCALE).cast("long"))


def _norm_sq(iv):
    return F.aggregate(iv, F.lit(0).cast("long"), lambda acc, x: acc + x * x)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


_IVEC_SQL = f"list_transform(embedding, x -> floor(x::DOUBLE * {SCALE})::BIGINT)"
_NORM_SQL = "list_sum(list_transform(iv, x -> x * x))::BIGINT"


def _dot_sql(a: str, b: str) -> str:
    return f"list_sum(list_transform(generate_series(1, {DIM}), i -> {a}[i] * {b}[i]))::BIGINT"
