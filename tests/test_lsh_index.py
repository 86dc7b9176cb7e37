"""CDC-maintained LSH band index (operators/lsh_index.py): incremental
refresh from corpus snapshot diffs, band-bucket-pruned probes, and
convergence vs a from-scratch rebuild through update/delete churn."""

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.operators.lsh_index import NearDupIndex
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable


def _batch(spark, rows):
    """rows: (op, doc_id, seq, text)"""
    df = spark.createDataFrame(rows, "op string, doc_id string, seq long, text string")
    return df.withColumn("ts", F.timestamp_seconds(F.col("seq")).cast("timestamp_ntz"))


def _index_rows(idx):
    return {
        (r["b"], r["band_key"], r["ref_doc_id"])
        for r in idx.index.read().select("b", "band_key", "ref_doc_id").collect()
    }


def _rebuilt_rows(idx):
    """Band set recomputed from scratch off the corpus's current state."""
    docs = idx._live_docs(idx.target.read_raw())
    return {
        (r["b"], r["band_key"], r["ref_doc_id"])
        for r in idx._bands(docs).collect()
    }


def _probe_pairs(idx, spark, rows):
    batch = spark.createDataFrame(rows, "doc_id string, text string")
    return {
        (r["doc_new"], r["doc_existing"]) for r in idx.probe(batch).collect()
    }


DOC_A = "the quick brown fox jumps over the lazy dog near the river bank"
DOC_B = "entirely different words about spark shuffles and parquet files here"
NEAR_A = "the quick brown fox jumps over the lazy dog near the river shore"


def test_build_probe_and_incremental_churn(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    idx = NearDupIndex(t, str(tmp_path / "ix"), num_buckets=8)

    apply_changes(
        t,
        _batch(spark, [("I", "a", 1, DOC_A), ("I", "b", 2, DOC_B)]),
        "lsh", 0,
    )
    assert idx.refresh() is not None
    assert _index_rows(idx) == _rebuilt_rows(idx)

    # a near-dup of A collides on at least one band; a novel doc doesn't
    pairs = _probe_pairs(idx, spark, [("x", NEAR_A), ("y", "completely novel text with zero overlap whatsoever in tokens")])
    assert ("x", "a") in pairs
    assert not any(d == "y" for d, _ in pairs)

    # update: A's text becomes B-like -> probing old A text stops matching a
    apply_changes(t, _batch(spark, [("U", "a", 3, DOC_B)]), "lsh", 1)
    assert idx.refresh() is not None
    assert _index_rows(idx) == _rebuilt_rows(idx)
    assert ("x", "a") not in _probe_pairs(idx, spark, [("x", NEAR_A)])
    # and A now collides with B's band keys
    assert ("x", "a") in _probe_pairs(idx, spark, [("x", DOC_B)])

    # delete: b vanishes from the index
    apply_changes(t, _batch(spark, [("D", "b", 4, None)]), "lsh", 2)
    assert idx.refresh() is not None
    assert _index_rows(idx) == _rebuilt_rows(idx)
    assert not any(e == "b" for _, e in _probe_pairs(idx, spark, [("x", DOC_B)]))

    # idempotent: no corpus change -> no-op
    assert idx.refresh() is None


def test_unchanged_band_keys_survive_partial_text_change(spark, tmp_path):
    """NEAR_A differs from DOC_A by one trailing token: most shingles are
    shared, so some band keys are typically identical across the update.
    The symmetric-difference commit must keep those keys live (a
    tombstone+insert pair of the same key at the same _seq would fold
    nondeterministically)."""
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    idx = NearDupIndex(t, str(tmp_path / "ix"), num_buckets=8)
    apply_changes(t, _batch(spark, [("I", "a", 1, DOC_A)]), "lsh", 0)
    idx.refresh()
    before = _index_rows(idx)
    apply_changes(t, _batch(spark, [("U", "a", 2, NEAR_A)]), "lsh", 1)
    idx.refresh()
    after = _index_rows(idx)
    assert after == _rebuilt_rows(idx)
    # the docs genuinely share band keys in this fixture (else the test
    # exercises nothing) and every shared key survived the update
    shared = before & after
    assert shared, "fixture regression: no shared band keys across the edit"


def test_full_rebuild_after_diff_base_expired(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    idx = NearDupIndex(t, str(tmp_path / "ix"), num_buckets=8)
    apply_changes(t, _batch(spark, [("I", "a", 1, DOC_A)]), "lsh", 0)
    idx.refresh()
    for s in range(2, 6):
        apply_changes(
            t,
            _batch(spark, [("I", f"d{s}", s, DOC_B + f" variant {s} token tail")]),
            "lsh", s,
        )
    t.expire_snapshots(keep_last=1)  # the index's diff base is gone
    assert idx.refresh() is not None
    assert _index_rows(idx) == _rebuilt_rows(idx)


def test_probe_prunes_index_read_to_band_buckets(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    idx = NearDupIndex(t, str(tmp_path / "ix"), num_buckets=8)
    apply_changes(
        t,
        _batch(
            spark,
            [("I", f"k{i}", i + 1, f"document number {i} with shared filler tokens plus unique tail {i} {i+1} {i+2}")
             for i in range(12)],
        ),
        "lsh", 0,
    )
    idx.refresh()
    # a 1-doc probe's band keys hash into <= LSH_BANDS buckets; the
    # index read must be pruned to those, not all 8
    from ethereum_etl_airflow_spark.functions.dedup import LSH_BANDS

    batch = spark.createDataFrame([("x", NEAR_A)], "doc_id string, text string")
    docs = batch.select(
        F.col("doc_id").alias("ref_doc_id"), idx.tokens_of(batch).alias("toks")
    )
    n_keys = idx._bands(docs).count()
    assert n_keys == LSH_BANDS
    # correctness of the pruned path: pairs equal an unpruned band join
    pruned = _probe_pairs(idx, spark, [("x", NEAR_A)])
    from ethereum_etl_airflow_spark.functions.dedup import probe_lsh_index

    full_idx = idx.index.read().select(
        F.col("ref_doc_id").alias("doc_id"), "b", "band_key"
    )
    pb = idx._bands(docs).select(F.col("ref_doc_id").alias("doc_id"), "b", "band_key")
    unpruned = {
        (r["doc_new"], r["doc_existing"])
        for r in probe_lsh_index(pb, full_idx).collect()
    }
    assert pruned == unpruned


def test_refresh_replay_is_fenced(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=4)
    idx = NearDupIndex(t, str(tmp_path / "ix"), num_buckets=8)
    apply_changes(t, _batch(spark, [("I", "a", 1, DOC_A)]), "lsh", 0)
    idx.refresh()
    v = idx.index.current_version()
    # simulating a crashed-then-replayed refresh loop: target unchanged
    assert idx.refresh() is None
    assert idx.index.current_version() == v
    assert _index_rows(idx) == _rebuilt_rows(idx)


# --------------------------------------------------------------------------
# property: ANY edit sequence keeps the incrementally-maintained index
# equal to a from-scratch rebuild of the corpus's current state
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
_DOCS = ["d1", "d2", "d3"]


@st.composite
def edit_script(draw):
    """1-3 batches of (op, doc_id, text) edits over a tiny doc universe
    with heavily-overlapping vocabularies (shared band keys likely)."""
    n_batches = draw(st.integers(1, 3))
    script, seq = [], 0
    for _ in range(n_batches):
        n = draw(st.integers(1, 4))
        batch = []
        for _ in range(n):
            seq += 1
            doc = draw(st.sampled_from(_DOCS))
            op = draw(st.sampled_from(["I", "U", "D"]))
            if op == "D":
                batch.append((op, doc, seq, None))
            else:
                k = draw(st.integers(0, 8))  # 0-2 tokens => unindexable
                words = [draw(st.sampled_from(_WORDS)) for _ in range(k)]
                batch.append((op, doc, seq, " ".join(words)))
        script.append(batch)
    return script


@given(edit_script())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_any_edit_script_keeps_index_equal_to_rebuild(
    spark, tmp_path_factory, script
):
    root = tmp_path_factory.mktemp("lshprop")
    t = SnapshotTable(spark, str(root / "t"), num_buckets=4)
    idx = NearDupIndex(t, str(root / "ix"), num_buckets=4)
    for epoch, batch in enumerate(script):
        apply_changes(t, _batch(spark, batch), "lshp", epoch=epoch)
        idx.refresh()
        assert _index_rows(idx) == _rebuilt_rows(idx)
