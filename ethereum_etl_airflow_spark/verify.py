"""Data-quality verification: the reference's verify stage as a library.

The reference runs one assertion SQL per table per load
(``verify/sqls/*.sql`` wired at ``build_load_dag.py:220-234,304-317``;
streaming variants ``verify_streaming/sqls/*.sql`` at
``build_verify_streaming_dag.py:81-100``), each encoded as
``SELECT IF(cond, 1, CAST('msg' AS INT64))`` — failing by cast error.

Spark-first improvements:
* each check contributes AGGREGATE EXPRESSIONS, and ``run_checks``
  evaluates every check in ONE job (one scan, one row back to the
  driver) instead of one query per check;
* failures raise ``VerificationError`` with the offending values (no
  cast-error trick);
* the same checks run per micro-batch via
  ``ChangeLogTailer(post_batch_checks=...)`` — the streaming-verify
  cadence without a second pipeline.

Checks implemented (reference file -> function):
  blocks_count.sql (gap-free range)        -> gap_free
  transactions_count.sql (cross-table sum) -> counts_reconcile
  logs_count.sql (dense per-group seq)     -> dense_per_group
  *_have_latest.sql (freshness lag)        -> freshness
  north-rule token invariant               -> tokens_invariant
  uniqueness (MERGE key contract)          -> unique_key
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import timezone
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class VerificationError(AssertionError):
    pass


@dataclass
class Check:
    name: str
    aggs: list  # aggregate Columns, aliased f"{name}__{i}"
    judge: Callable[[list], tuple[bool, str]]  # values -> (passed, detail)


def gap_free(key: str, tolerance: int = 0) -> Check:
    """count(*) == max(key) - min(key) + 1 (+- tolerance) — the
    blocks_count.sql completeness invariant."""
    name = f"gap_free_{key}"
    aggs = [
        F.count("*").alias(f"{name}__0"),
        F.min(key).alias(f"{name}__1"),
        F.max(key).alias(f"{name}__2"),
    ]

    def judge(v):
        n, lo, hi = v
        if n == 0:
            return True, "empty"
        expected = hi - lo + 1
        ok = abs(n - expected) <= tolerance
        return ok, f"count={n} range={lo}..{hi} expected={expected}"

    return Check(name, aggs, judge)


def unique_key(*keys: str) -> Check:
    """count(*) == count(distinct keys) — the MERGE key contract."""
    name = f"unique_{'_'.join(keys)}"
    aggs = [
        F.count("*").alias(f"{name}__0"),
        F.count_distinct(*[F.col(k) for k in keys]).alias(f"{name}__1"),
    ]
    return Check(name, aggs, lambda v: (v[0] == v[1], f"rows={v[0]} distinct={v[1]}"))


def tokens_invariant() -> Check:
    """Every live row satisfies n_tok == size(tokens) (BASELINE
    input_hint per-row invariant)."""
    name = "tokens_invariant"
    bad = F.count_if(
        F.col("n_tok").isNotNull() & (F.col("n_tok").cast("long") != F.size("tokens"))
    )
    return Check(name, [bad.alias(f"{name}__0")], lambda v: (v[0] == 0, f"violations={v[0]}"))


def freshness(ts_col: str, max_lag_seconds: int, now=None) -> Check:
    """max(ts) within lag bound of 'now' (blocks_have_latest.sql)."""
    name = f"freshness_{ts_col}"
    aggs = [F.max(ts_col).alias(f"{name}__0")]
    now_fn = now or (lambda: __import__("time").time())

    def judge(v):
        latest = v[0]
        if latest is None:
            return False, "no rows"
        # Spark collects naive datetimes from a UTC-pinned session; pin
        # UTC before epoch conversion or non-UTC hosts skew the lag.
        if getattr(latest, "tzinfo", None) is None:
            latest = latest.replace(tzinfo=timezone.utc)
        lag = now_fn() - latest.timestamp()
        return lag <= max_lag_seconds, f"lag={lag:.0f}s max={max_lag_seconds}s"

    return Check(name, aggs, judge)


def run_checks(df: DataFrame, checks: list[Check], strict: bool = True) -> dict[str, str]:
    """Evaluate ALL checks in one aggregation job. Returns
    {check: detail}; raises VerificationError on first failure when
    strict."""
    all_aggs = [a for c in checks for a in c.aggs]
    row = df.agg(*all_aggs).collect()[0].asDict()
    results: dict[str, str] = {}
    failures = []
    for c in checks:
        vals = [row[f"{c.name}__{i}"] for i in range(len(c.aggs))]
        ok, detail = c.judge(vals)
        results[c.name] = f"{'PASS' if ok else 'FAIL'}: {detail}"
        if not ok:
            failures.append(f"{c.name}: {detail}")
    if failures and strict:
        raise VerificationError("; ".join(failures))
    return results


def dense_per_group(df: DataFrame, group: str, seq: str) -> DataFrame:
    """Groups violating max(seq) == count(*) (logs_count.sql:4-9) —
    returns offending groups (empty == pass); a grouped check, so it
    runs as its own job, unlike the scalar checks above."""
    return (
        df.groupBy(group)
        .agg(F.count("*").alias("n"), F.max(seq).alias("max_seq"))
        .where(F.col("max_seq") != F.col("n"))
    )


def counts_reconcile(
    agg_df: DataFrame, agg_expr, detail_df: DataFrame, tolerance: int = 0
) -> tuple[bool, str]:
    """sum over summary table == count of detail table
    (transactions_count.sql): two tiny aggregates compared driver-side."""
    lhs = agg_df.agg(agg_expr.alias("v")).collect()[0]["v"] or 0
    rhs = detail_df.count()
    return abs(lhs - rhs) <= tolerance, f"sum={lhs} count={rhs}"
