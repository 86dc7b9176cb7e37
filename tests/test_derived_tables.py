"""Derived CDC tables: the reference's dependent-export / parse-from-
live chain (build_export_dag.py:165-253 S3/S4; parse DAG live mode) as
stream transformations — a child table maintained from the SAME change
feed through a filter/project derivation, incrementally per batch.

Semantics: the child holds the latest matching change per key (here:
the latest 'web'-sourced version of each doc) — the LWW fold of the
FILTERED stream."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable
from ethereum_etl_airflow_spark.sources.feed import FeedConfig, generate_batch

CFG = FeedConfig(n_docs=300, events_per_batch=700, n_batches=3, dup_tail=80)


def derive_web_changes(batch_df):
    """The derivation: only web-sourced upserts and all deletes flow to
    the child (deletes must propagate so the child retracts too)."""
    return batch_df.where((F.col("source") == "web") | (F.col("op") == "D"))


def oracle_child_state(spark, cfg, upto):
    batches = [generate_batch(spark, cfg, b) for b in range(upto + 1)]
    all_ev = batches[0]
    for b in batches[1:]:
        all_ev = all_ev.unionByName(b, allowMissingColumns=True)
    filt = all_ev.where((F.col("source") == "web") | (F.col("op") == "D"))
    w = W.partitionBy("doc_id").orderBy(F.desc("seq"))
    latest = filt.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return latest.where(F.col("op") != "D").select("doc_id", "tokens", "n_tok", "source")


def canon(df):
    return sorted(
        (r.doc_id, tuple(r.tokens or []), r.n_tok, r.source)
        for r in df.select("doc_id", "tokens", "n_tok", "source").collect()
    )


def test_parent_and_derived_child_stay_consistent(spark, tmp_path):
    parent = SnapshotTable(spark, str(tmp_path / "parent"), num_buckets=8)
    child = SnapshotTable(spark, str(tmp_path / "child"), num_buckets=4)
    for b in range(CFG.n_batches):
        batch = generate_batch(spark, CFG, b)
        apply_changes(parent, batch, "par", epoch=b)
        apply_changes(child, derive_web_changes(batch), "chi", epoch=b)
    got = canon(child.read())
    want = canon(oracle_child_state(spark, CFG, CFG.n_batches - 1))
    assert got == want and len(got) > 0
    # every child row is the web version of a doc
    assert all(r[3] == "web" for r in got)
    # child is a strict subset of parent keys' history, not of parent's
    # final state (a doc whose LAST event is 'code' keeps its latest
    # web version in the child) — verify at least the schema contract
    assert set(child.read().columns) >= {"doc_id", "tokens", "n_tok", "source"}