"""Custom stateful streaming operator: per-source running counters via
``applyInPandasWithState`` (arbitrary stateful processing, the Spark
construct for operators the built-in windowed aggs can't express).

The engine's core LWW apply is deliberately STATELESS per batch
(SURVEY §2.10 — monotone seq + idempotent fold make cross-batch state
unnecessary). This module covers the genuinely-stateful telemetry
case: running totals per source that survive micro-batch boundaries
through the state store, updated with Arrow-batched pandas (no per-row
Python), emitted in update mode after every batch.

State shape: (n_events, n_deletes, max_seq) per source — bounded by
source cardinality (small), unlike per-doc state which would be
10^9-keyed and belongs in the table itself, not the state store.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_seq", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_seq", T.LongType()),
    ]
)


def _update(key, pdfs, state: GroupState):
    import pandas as pd

    n, d, mx = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        n += len(pdf)
        d += int((pdf["op"] == "D").sum())
        if len(pdf):
            mx = max(mx, int(pdf["seq"].max()))
    state.update((n, d, mx))
    yield pd.DataFrame(
        {"source": [key[0]], "n_events": [n], "n_deletes": [d], "max_seq": [mx]}
    )


def running_source_stats(grouped_stream) -> DataFrame:
    """Apply the stateful counter to a stream grouped by source."""
    return grouped_stream.applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def use_rocksdb_state_store(spark) -> bool:
    """Switch the session's streaming state store to RocksDB (bundled
    with Spark since 3.2): at 10^9-key state the default HDFS-backed
    in-memory store OOMs executors, while RocksDB spills to local disk
    with bounded memory — the production setting for large stateful
    jobs. Returns False when the provider class is unavailable."""
    provider = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        spark._jvm.java.lang.Class.forName(provider)
    except Exception:
        return False
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    # changelog checkpointing: upload only per-batch deltas, not full
    # RocksDB snapshots (the at-scale checkpoint cost lever)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    return True


def run_running_stats_stream(
    spark,
    feed_dir: str,
    checkpoint_dir: str,
    out_table: str = "running_source_stats",
    max_files_per_trigger: int | None = 1,
    rocksdb: bool = False,
) -> DataFrame:
    """Drive the stateful counters over the feed directory; the memory
    sink accumulates one row per (source, micro-batch) — the LAST row
    per source is the current running state."""
    if rocksdb:
        use_rocksdb_state_store(spark)
    sample = spark.read.option("recursiveFileLookup", "true").parquet(feed_dir)
    reader = spark.readStream.schema(sample.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.option("recursiveFileLookup", "true").parquet(feed_dir)
    # materialize the group key as a real column first — grouping by a
    # computed expression hands applyInPandasWithState a null key for
    # rows where the underlying column is null
    grouped = stream.withColumn(
        "source_key", F.coalesce(F.col("source"), F.lit("<delete>"))
    ).groupBy("source_key")
    q = (
        running_source_stats(grouped)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(out_table)
