"""Leaf module: generalized n-gram shingling and SimHash fingerprints
shared by the text-analysis and decontamination operators (see
veclib.py for the import-graph rule — registration modules must not
import names from each other at module top level; ``text.py`` and
``decontam.py`` both build from these).

SimHash (Charikar 2002): per-bit majority vote over the token hashes.
The vote fold runs in ONE pass over the token-hash array — a per-bit
formulation would re-evaluate the hash column once per bit (bits× the
work) because higher-order-function lambdas don't share common
subexpressions.

Every helper has a Spark column builder and a value-identical DuckDB
SQL fragment (portable md5-based hashing — functions/hashing.py), so
any operator composed from them stays oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ngrams_col(toks: Column, n: int) -> Column:
    """Distinct n-gram token shingles of a token array (w-shingling).

    Guarded for short docs: Spark's ``sequence(1, stop)`` DESCENDS when
    ``stop < 1``, so docs with fewer than ``n`` tokens must short-
    circuit to an empty array instead.
    """
    sz = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), sz - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(sz >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngrams_sql(toks_expr: str, n: int) -> str:
    """Same shingling as :func:`ngrams_col`, as a DuckDB fragment
    (DuckDB's ``generate_series(1, stop)`` is empty for ``stop < 1``,
    so no short-doc guard is needed; list slices are inclusive)."""
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, len({toks_expr}) - {n - 1}), "
        f"i -> array_to_string(({toks_expr})[i:i+{n - 1}], ' ')))"
    )


def simhash_expr(token_hashes: Column, bits: int) -> Column:
    """``bits``-wide SimHash of a token-hash array column (Spark side).

    One fused ``aggregate`` fold: a ``bits``-slot vote-counter array
    updated per token hash, then a weighted sum of the positive-vote
    bit positions. No explode, no shuffle — a narrow map.
    """
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    votes = F.aggregate(
        token_hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                powers,
                lambda p: F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
            ),
            lambda a, b: a + b,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_sql(token_hashes_expr: str, bits: int) -> str:
    """Same SimHash as :func:`simhash_expr`, as a DuckDB fragment."""
    return (
        f"list_sum(list_transform(generate_series(0, {bits - 1}), i -> "
        f"CASE WHEN list_sum(list_transform({token_hashes_expr}, x -> "
        f"CASE WHEN (x >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN 1 << i ELSE 0 END))::BIGINT"
    )
