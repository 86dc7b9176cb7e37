"""HyperLogLog core (leaf module — no registration imports, safe to
import from operators and registration modules alike; see veclib.py
for the import-order rationale).

Register layout: m = 64 registers indexed by ``phash60(key) % 64``;
rho = position of the first 1-bit in the remaining B = 54 hash bits
(1..55, 0 = register never touched). The harmonic mean is kept as the
exact integer ``sum(2^(B+1-rho))`` so Spark, DuckDB and driver-side
Python all agree bit-for-bit; the estimate is ONE IEEE division.

Registers merge with elementwise MAX — associative, commutative,
idempotent. Idempotence is what makes the sketch exactly-once-friendly:
re-merging a replayed batch's registers is a no-op even without
fencing (operators/table_stats.py leans on both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.functions.hashing import phash60

#: registers (m = 2^6) and hash bits left after the register index
HLL_M = 64
HLL_B = 54  # 60 - log2(m)

#: alpha_m * m^2 * 2^(B+1): full estimator numerator as one literal
HLL_NUM = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(2 ** (HLL_B + 1))


def batch_registers(df: DataFrame, key_col: str = "doc_id") -> list[int]:
    """The m register values of a DataFrame column, as a plain list
    (0 = empty register). One narrow map + a 64-group MAX agg; the
    collect is a bounded driver scalar (<= m rows) — the same budget
    class as verify.py's check aggregates."""
    h = phash60(F.col(key_col).cast("string"))
    b = df.where(F.col(key_col).isNotNull()).select(
        (h % HLL_M).alias("idx"), F.shiftright(h, 6).alias("rest")
    )
    rho = F.when(
        F.col("rest") > 0, F.lit(HLL_B + 1) - F.length(F.bin("rest"))
    ).otherwise(F.lit(HLL_B + 1))
    rows = (
        b.select("idx", rho.alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
        .collect()
    )
    regs = [0] * HLL_M
    for r in rows:
        regs[r.idx] = r.rho
    return regs


def merge_registers(a: list[int], b: list[int]) -> list[int]:
    """Elementwise MAX merge (associative / commutative / idempotent)."""
    return [x if x >= y else y for x, y in zip(a, b)]


def estimate(regs: list[int]) -> float:
    """Raw HLL estimate from a register list (one division)."""
    s = sum(1 << (HLL_B + 1 - r) for r in regs)
    return HLL_NUM / float(s)
