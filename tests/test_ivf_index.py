"""Incrementally-maintained IVF index: frozen-centroid refresh,
tombstones, probe-pruned search, exactly-once advancement."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from ethereum_etl_airflow_spark.functions.veclib import DIM, SCALE
from ethereum_etl_airflow_spark.operators.ivf_index import IvfIndex
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable, bucket_expr


def _vec(direction: int, mag: float = 1.0) -> list[float]:
    """Deterministic unit-ish vector pointing along one axis pair."""
    v = [0.01] * DIM
    v[direction % DIM] = mag
    v[(direction + 1) % DIM] = mag / 2
    return v


def _commit(spark, table, rows, seq, deletes=(), replace=False):
    data = [
        (doc, _vec(d, m), s, seq, 1, False)
        for doc, d, m, s in rows
    ] + [(doc, [0.0] * DIM, "x", seq, 1, True) for doc in deletes]
    df = spark.createDataFrame(
        data,
        f"doc_id string, embedding array<float>, source string, "
        f"_seq long, _epoch long, _tombstone boolean",
    ).withColumn("_bucket", bucket_expr(F.col("doc_id"), table.num_buckets))
    table.commit(
        df,
        replace_buckets=set(range(table.num_buckets)) if replace else set(),
        app_id="vecs",
        epoch=seq,
        new_schema=df.drop("_bucket").schema,
    )


@pytest.fixture()
def target(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "vecs"), num_buckets=4)
    rows = [(f"doc-{i:02d}", i % 5, 1.0 + (i % 3) * 0.1, "a") for i in range(30)]
    _commit(spark, t, rows, seq=1)
    return t


def _assignments(idx):
    return {
        r["doc_id"]: r["cluster"] for r in idx.index.read().collect()
    }


def test_build_assigns_every_live_doc(spark, tmp_path, target):
    idx = IvfIndex(target, str(tmp_path / "ivf"))
    idx.build()
    a = _assignments(idx)
    assert len(a) == 30
    assert set(a) == {f"doc-{i:02d}" for i in range(30)}
    assert len(idx.centroids()) >= 1


def test_refresh_matches_frozen_reassignment(spark, tmp_path, target):
    """After churn, refresh == assigning the CURRENT live vectors
    against the frozen centroids (never a retrain)."""
    idx = IvfIndex(target, str(tmp_path / "ivf"))
    idx.build()
    cents_before = idx.centroids()
    # upsert: move doc-03 to a different direction; add doc-99; delete doc-07
    _commit(
        spark, target,
        [("doc-03", 40, 2.0, "a"), ("doc-99", 41, 2.0, "a")],
        seq=2, deletes=["doc-07"],
    )
    info = idx.refresh()
    assert info is not None and info["rows"] == 3
    assert idx.centroids() == cents_before  # frozen
    got = _assignments(idx)
    assert "doc-07" not in got and "doc-99" in got
    # reference: assign all current live vectors against frozen cents
    from ethereum_etl_airflow_spark.functions.ivf import _argmax_cluster
    from ethereum_etl_airflow_spark.functions.veclib import int_vec

    live = target.read().where(~F.coalesce(F.col("_tombstone"), F.lit(False)))
    ref = {
        r["doc_id"]: r["c"]
        for r in live.select(
            "doc_id",
            _argmax_cluster(int_vec(F.col("embedding")), cents_before).alias("c"),
        ).collect()
    }
    assert got == ref


def test_refresh_is_exactly_once(spark, tmp_path, target):
    idx = IvfIndex(target, str(tmp_path / "ivf"))
    idx.build()
    assert idx.refresh() is None  # already current
    _commit(spark, target, [("doc-00", 9, 3.0, "a")], seq=2)
    assert idx.refresh() is not None
    assert idx.refresh() is None  # replay no-ops


def test_search_reads_only_probed_buckets(spark, tmp_path, target):
    idx = IvfIndex(target, str(tmp_path / "ivf"))
    idx.build()
    q = _vec(2, 1.0)
    res = idx.search(q, k=5).collect()
    assert 1 <= len(res) <= 5
    # exact rank over the probed clusters, computed independently
    cents = idx.centroids()
    q_iv = [math.floor(x * SCALE) for x in q]
    probe_scores = sorted(
        (
            -(sum(a * b for a, b in zip(q_iv, v)) / math.sqrt(sum(x * x for x in v))),
            c,
        )
        for c, v in cents
    )
    probed = {c for _, c in probe_scores[:2]}
    assert {r["cluster"] for r in res} <= probed
    # scores descend and ties break by doc_id
    scores = [(r["score"], r["doc_id"]) for r in res]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))


def test_rebuild_after_drift_retrains(spark, tmp_path, target):
    idx = IvfIndex(target, str(tmp_path / "ivf"))
    idx.build()
    _commit(spark, target, [(f"new-{i}", 50 + i, 2.5, "b") for i in range(10)], seq=2)
    idx.refresh()
    since = int(idx.index.snapshot()["properties"]["assignments_since_build"])
    assert since == 10
    info = idx.build()  # retrain resets the drift counter
    assert info["index_version"] == idx.index.current_version()
    assert int(idx.index.snapshot()["properties"]["assignments_since_build"]) == 0
    assert len(_assignments(idx)) == 40
