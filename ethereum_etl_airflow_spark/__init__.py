"""ethereum_etl_airflow_spark — a PySpark-native CDC / incremental-ingest engine.

Brand-new engine (not a port) with the query and data-processing
capabilities of blockchain-etl/ethereum-etl-airflow, re-expressed
Spark-first: Structured Streaming change-log tailer applying
insert/update/delete events (keyed ``doc_id``, monotone ``seq``) to a
snapshot-versioned table of pre-tokenized training sequences with
exactly-once semantics, schema evolution, skew-aware salted
partitioning, and per-batch lineage + metrics.

Subsystems (SURVEY.md §7.1):
  sources/    ordered change-feed generator + readers (ref: export DAG)
  sinks/      snapshot-versioned table with atomic commits + epoch
              fencing (ref: load DAG MERGE / WRITE_TRUNCATE publish)
  operators/  CDC apply (LWW dedup + keyed merge), verify invariants
  streaming/  foreachBatch tailer, checkpoint resume, lineage
  plans/      extraction-spec compiler, toposort, incremental state
  functions/  text analysis, dedup (MinHash/SimHash), similarity, multimodal
"""

__version__ = "0.1.0"
