"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB the dominant read cost is how many files a 2-predicate scan
touches. Sorting by one column clusters that column only; interleaving
the bits of two columns (the Z-order curve) gives every file a tight
bounding box in BOTH dimensions, so min/max file stats prune scans
filtered on either or both — the layout trick Iceberg/Delta expose as
``OPTIMIZE ... ZORDER BY``. This module computes the curve value as a
pure column expression (32 unrolled shift/mask terms, whole-stage
codegen, no UDF), usable as a ``repartitionByRange``/``sortWithinPartitions``
key on any write path, e.g. ``SnapshotTable`` compaction.

Everything is exact int64 bit math — identical in Spark and DuckDB, so
the oracle replays the curve bit-for-bit.

Reference parity: the reference relies on BigQuery date-partitioned +
clustered tables (``dags/resources/stages/enrich/table_definitions``:
``"clustering": [...]`` fields); Z-ordering is the lake-side equivalent
when two filter dimensions matter at once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.queries import _t, register

#: bits interleaved per dimension (two 16-bit dims -> 32-bit z value)
Z_BITS = 16

#: coarse cluster id = top 8 bits of the 32-bit curve value
Z_BUCKET_SHIFT = 24


def zvalue(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative int
    columns: x occupies even bit positions, y odd. Pure shift/mask
    terms — stays inside whole-stage codegen."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        z = z + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
    return z


def zvalue_sql(x_expr: str, y_expr: str, bits: int = Z_BITS) -> str:
    """The same interleave as :func:`zvalue`, as a DuckDB fragment."""
    terms = [
        f"((({x_expr} >> {b}) & 1) << {2 * b}) + "
        f"((({y_expr} >> {b}) & 1) << {2 * b + 1})"
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "zorder_layout_key",
    oracle=f"""
    WITH base AS (
        SELECT event_id,
               user_id % {1 << Z_BITS} AS x,
               (epoch_us(ts) // 3600000000) % {1 << Z_BITS} AS y
        FROM events
    )
    SELECT event_id, x, y,
           {zvalue_sql('x', 'y')} AS zval,
           ({zvalue_sql('x', 'y')} >> {Z_BUCKET_SHIFT}) AS zbucket
    FROM base
    """,
    doc="Z-order (Morton) clustering key over (user key, event hour): "
    "bit-interleaved curve value plus the coarse zbucket a writer would "
    "range-partition/sort files by — 2-D file pruning for scans that "
    "filter on either dimension",
    survey_ref="data layout for 100 TB scans; lake-side analogue of the "
    "reference's BigQuery clustering fields "
    "(enrich/table_definitions *.json 'clustering')",
)
def zorder_layout_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow zero-shuffle projection: two bucketed dims (key mod 2^16,
    event hour mod 2^16) interleaved into the 32-bit curve value. A
    write path uses this as ``repartitionByRange(zbucket) +
    sortWithinPartitions(zval)``; here the curve itself is the
    oracle-checked output."""
    events = _t(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        (F.col("user_id") % (1 << Z_BITS)).alias("x"),
        # ts is TIMESTAMP_NTZ from parquet; the session tz is pinned UTC
        # (session.py), so the cast is the identity epoch mapping.
        (
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
            % (1 << Z_BITS)
        ).alias("y"),
    )
    z = zvalue(F.col("x"), F.col("y"))
    return base.select(
        "event_id",
        "x",
        "y",
        z.alias("zval"),
        F.shiftright(z, Z_BUCKET_SHIFT).alias("zbucket"),
    )


#: compaction target: rows per rewritten file (stand-in for bytes)
BIN_TARGET = 200


@register(
    "compaction_bin_packing",
    oracle=f"""
    WITH files AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS d,
               COUNT(*)::BIGINT AS file_rows
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, d, file_rows,
           ((SUM(file_rows) OVER (PARTITION BY event_type ORDER BY d)
              - file_rows) // {BIN_TARGET})::BIGINT AS bin_id
    FROM files
    """,
    doc="minor-compaction planner: per-series delta files (one per "
    "event_type x day, sized by row count) packed into rewrite bins "
    "by cumulative-sum division — bin_id = floor(cum_before / "
    f"{BIN_TARGET}), the deterministic sorted-packing every LSM-ish "
    "lake maintenance pass runs before rewriting small files",
    survey_ref="maintenance family sibling of the snapshot sink's "
    "compaction thresholds (sinks/snapshot_table.py compact()) and "
    "zorder_layout_key — this is the PLANNING step as an oracle-"
    "checked query; ref analogue: load-stage file consolidation "
    "(build_load_dag.py temp-table loads)",
)
def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: one fact-sized agg to file grain (map-side combined),
    then a per-series cumsum window on #files rows — the window
    repartitions by event_type only, never a global sort. At 10^10
    events the planner's input is file metadata, not data: this query
    IS the metadata pass, so the heavy stage is the synthetic file
    derivation, not the packing."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    files = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).agg(F.count("*").alias("file_rows"))
    cum = F.sum("file_rows").over(
        W.partitionBy("event_type").orderBy("d")
    )
    return files.select(
        "event_type",
        "d",
        "file_rows",
        # cum_before and the target are exact longs; floor-div via
        # floor() stays exact (magnitudes ≪ 2^53)
        F.floor((cum - F.col("file_rows")) / BIN_TARGET)
        .cast("long")
        .alias("bin_id"),
    )
