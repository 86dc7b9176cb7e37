"""Watermark auto-sizing: measure event-time lateness, don't guess it.

A watermark delay is a CONTRACT: events later than the delay are
dropped from windowed telemetry (``streaming/windows.py``; the CDC
apply path itself is lateness-proof — LWW by seq). Picking the delay
by folklore ("10 minutes should be fine") silently discards data or
holds state for hours. This module measures the actual lateness
distribution of a feed and turns a coverage target into a delay.

Definition: an event's lateness is ``seen_max - own_ts`` where
``seen_max`` is the maximum event-time among everything that ARRIVED
strictly before it (arrival order = the feed's offset/sequence
order). That is exactly the quantity a watermark must dominate for
the event to be admitted.

The naive computation is a running max over the whole feed in arrival
order — one global window = one task at 10^10 events. The scalable
form here is the classic TWO-PHASE SCAN (the same discipline as
``corpus_pack_sequences``'s prefix sums):

1. chunk the feed by ``arrival DIV chunk_size`` (pure projection);
2. per-chunk max event-time — a tiny map-side-combined aggregate
   (#chunks rows);
3. exclusive prefix-max over the chunk table — a window over
   #chunks rows (thousands, not billions);
4. broadcast-join the chunk prefix back; within each chunk a
   partition-parallel window gives the strictly-preceding max, and
   ``greatest(chunk_prefix, within_chunk_max)`` is the global
   running max. No stage ever single-threads the full feed.

The lateness DISTRIBUTION is kept as exact log2 buckets
(``length(bin(sec)) - 1`` — the integer-bits discipline of
``text_unigram_surprisal``): ~40 buckets cover microseconds→years,
merging is addition, and the suggested delay is the smallest power
of two whose cumulative coverage meets the target — a one-sided
(conservative) answer by construction.

Reference parity: the reference polls freshness with
``*_have_latest.sql`` sensors and hard-codes its lateness tolerance;
measuring the feed is the engine-side upgrade (SURVEY §2.10
late/duplicate tolerance). Sibling of the per-key
``cdc_out_of_order_audit`` (operators/scd.py) which profiles
sequence-number displacement; this profiles event-TIME displacement,
the unit watermarks are declared in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

#: feed rows per scan chunk — #chunks = N / chunk_size must stay small
#: enough for the phase-3 window (10^10 rows / 2^20 ≈ 10^4 chunks)
DEFAULT_CHUNK = 1 << 20


def running_eventtime_max(
    df: DataFrame,
    arrival_col: str = "seq",
    ts_col: str = "ts",
    chunk_size: int = DEFAULT_CHUNK,
) -> DataFrame:
    """Add ``seen_max_sec`` (epoch seconds of the max event-time among
    strictly earlier arrivals; null for the first arrival) and
    ``ts_sec`` via the two-phase scan. Input needs a monotone
    non-negative integer ``arrival_col``."""
    sec = F.col(ts_col).cast("timestamp").cast("long")
    base = df.withColumn("ts_sec", sec).withColumn(
        "_chunk", F.expr(f"{arrival_col} DIV {chunk_size}")
    )
    chunk_max = base.groupBy("_chunk").agg(F.max("ts_sec").alias("_cmax"))
    # exclusive prefix max over the tiny chunk table
    wc = W.orderBy("_chunk").rowsBetween(W.unboundedPreceding, -1)
    prefix = chunk_max.select(
        "_chunk", F.max("_cmax").over(wc).alias("_pmax")
    )
    wi = (
        W.partitionBy("_chunk")
        .orderBy(arrival_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(prefix), "_chunk")
        .withColumn("_imax", F.max("ts_sec").over(wi))
        .withColumn("seen_max_sec", F.greatest("_pmax", "_imax"))
        .drop("_chunk", "_pmax", "_imax")
    )


def lateness_histogram(
    df: DataFrame,
    arrival_col: str = "seq",
    ts_col: str = "ts",
    chunk_size: int = DEFAULT_CHUNK,
) -> DataFrame:
    """Exact log2-bucketed lateness distribution: one row per bucket
    ``(bucket, ceil_sec, n)``. bucket -1 = on time (lateness <= 0 or
    first arrival), bucket b >= 0 = lateness in (2^(b-1), 2^b] ...
    i.e. ceil_sec = 2^b dominates every lateness in the bucket."""
    r = running_eventtime_max(df, arrival_col, ts_col, chunk_size)
    late_sec = F.col("seen_max_sec") - F.col("ts_sec")
    bucket = (
        F.when(late_sec.isNull() | (late_sec <= 0), F.lit(-1))
        .otherwise(F.length(F.bin(late_sec * 2 - 1)) - 1)
        .cast("long")
    )
    return (
        r.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "bucket",
            F.when(F.col("bucket") < 0, F.lit(0))
            .otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))"))
            .cast("long")
            .alias("ceil_sec"),
            "n",
        )
    )


def suggest_watermark(
    df: DataFrame,
    coverage: float = 0.999,
    arrival_col: str = "seq",
    ts_col: str = "ts",
    chunk_size: int = DEFAULT_CHUNK,
) -> int:
    """Smallest power-of-two delay (seconds) admitting at least
    ``coverage`` of the feed. Collects only the <= ~40-row histogram."""
    rows = sorted(
        lateness_histogram(df, arrival_col, ts_col, chunk_size).collect(),
        key=lambda r: r["bucket"],
    )
    total = sum(r["n"] for r in rows)
    need = coverage * total
    cum = 0
    for r in rows:
        cum += r["n"]
        if cum >= need:
            return int(r["ceil_sec"])
    return int(rows[-1]["ceil_sec"]) if rows else 0
