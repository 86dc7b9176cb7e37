"""Watermark auto-sizing: the two-phase running-max scan must equal
the naive global window, and the suggested delay must actually cover
the target fraction of a known out-of-order feed."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.streaming.lateness import (
    lateness_histogram,
    running_eventtime_max,
    suggest_watermark,
)

_BASE = dt.datetime(2024, 3, 1)


def _feed(spark, latenesses):
    """Arrival i carries event-time BASE + i - lateness[i] seconds —
    so event i's measured lateness vs the in-order prefix is
    exactly latenesses[i] (the prefix max is BASE + i - 1 ... use a
    dense on-time backbone to pin seen_max)."""
    rows = []
    for i, late in enumerate(latenesses):
        rows.append((i, _BASE + dt.timedelta(seconds=i - late)))
    return spark.createDataFrame(rows, "seq long, ts timestamp")


def test_two_phase_equals_naive(spark):
    import random

    rng = random.Random(7)
    lat = [rng.choice([0, 0, 0, 1, 5, 60, 900]) for _ in range(500)]
    df = _feed(spark, lat)
    two = running_eventtime_max(df, chunk_size=37).select(
        "seq", "seen_max_sec"
    )
    wn = W.orderBy("seq").rowsBetween(W.unboundedPreceding, -1)
    naive = df.select(
        "seq",
        F.max(F.col("ts").cast("long")).over(wn).alias("seen_max_sec"),
    )
    assert two.exceptAll(naive).count() == 0
    assert naive.exceptAll(two).count() == 0


def test_histogram_buckets_exact(spark):
    # seen_max before slot i is BASE + i - 1 (the on-time backbone),
    # so slot lateness k yields measured lateness k - 1
    lat = [0, 0, 2, 0, 3, 0, 5, 0, 8, 0]  # measured: 1, 2, 4, 7
    hist = {
        r["bucket"]: (r["ceil_sec"], r["n"])
        for r in lateness_histogram(_feed(spark, lat), chunk_size=3).collect()
    }
    assert hist[-1] == (0, 6)  # 5 on-time + first arrival
    assert hist[0] == (1, 1)  # 1s  -> bucket 0 (<= 2^0)
    assert hist[1] == (2, 1)  # 2s  -> bucket 1
    assert hist[2] == (4, 1)  # 4s  -> bucket 2
    assert hist[3] == (8, 1)  # 7s  -> bucket 3


def test_suggest_watermark_coverage(spark):
    # 96 on-time + measured lateness {1, 1, 120, 4000}: p>=0.97
    # needs 1s, p>=0.99 needs 128s, p=1.0 needs 4096s
    lat = [0] * 100
    # late slots interleaved mid-backbone so seen_max keeps advancing
    lat[50], lat[60], lat[70], lat[80] = 2, 2, 121, 4001
    df = _feed(spark, lat)
    assert suggest_watermark(df, coverage=0.97, chunk_size=16) == 1
    assert suggest_watermark(df, coverage=0.99, chunk_size=16) == 128
    assert suggest_watermark(df, coverage=1.0, chunk_size=16) == 4096


def test_suggested_delay_actually_covers(spark):
    import random

    rng = random.Random(13)
    lat = [rng.choice([0, 0, 0, 2, 30, 600]) for _ in range(400)]
    df = _feed(spark, lat)
    delay = suggest_watermark(df, coverage=0.999, chunk_size=64)
    r = running_eventtime_max(df, chunk_size=64)
    admitted = r.where(
        F.col("seen_max_sec").isNull()
        | (F.col("seen_max_sec") - F.col("ts_sec") <= delay)
    ).count()
    assert admitted >= 0.999 * r.count()
