"""Chain-reorg rewind (operators/reorg.py): bucket-scoped rollback to a
batch epoch + fence reset in one atomic commit, then corrected batches
re-apply through the normal exactly-once path and the final state
equals the canonical-chain fold."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.operators.reorg import rewind_to_epoch
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable
from ethereum_etl_airflow_spark.sources.feed import FeedConfig, generate_batch
from tests.test_cdc_core import canon_state

# same shape, different seeds = same block heights, different content —
# the orphaned fork vs the canonical chain
FORK = FeedConfig(n_docs=100, events_per_batch=250, n_batches=4, dup_tail=0, seed=7)
CANON = FeedConfig(n_docs=100, events_per_batch=250, n_batches=4, dup_tail=0, seed=99)


def _fold(events):
    w = W.partitionBy("doc_id").orderBy(F.desc("seq"))
    latest = events.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return latest.where(F.col("op") != "D").select(
        "doc_id", "tokens", "n_tok", "source", F.col("seq").alias("_seq")
    )


def _mixed_expected(spark, rewind_epoch):
    """fold(fork batches 0..k  +  canonical batches k+1..n)."""
    ev = generate_batch(spark, FORK, 0)
    for b in range(1, rewind_epoch + 1):
        ev = ev.unionByName(generate_batch(spark, FORK, b))
    for b in range(rewind_epoch + 1, CANON.n_batches):
        ev = ev.unionByName(generate_batch(spark, CANON, b))
    return _fold(ev)


def test_rewind_restores_epoch_state_and_reapply_converges(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=8)
    for b in range(FORK.n_batches):
        apply_changes(table, generate_batch(spark, FORK, b), "rg", epoch=b)
    head_before = table.current_version()

    # reorg: heights above batch 1 are orphaned
    info = rewind_to_epoch(table, "rg", epoch=1)
    assert info is not None and info["buckets_reverted"] > 0
    assert table.last_epoch("rg") == 1
    # state is exactly the fold of fork batches 0..1
    fork_events = generate_batch(spark, FORK, 0).unionByName(
        generate_batch(spark, FORK, 1)
    )
    assert canon_state(table.read()) == canon_state(_fold(fork_events))
    # the rewind is a recorded commit — time travel across it still works
    assert table.current_version() == head_before + 1
    assert canon_state(table.read(version=head_before)) != canon_state(table.read())

    # corrected (canonical) batches re-apply through the normal path
    for b in range(2, CANON.n_batches):
        lineage = apply_changes(table, generate_batch(spark, CANON, b), "rg", epoch=b)
        assert lineage is not None  # fence was reset, so these are NOT skipped
    assert canon_state(table.read()) == canon_state(_mixed_expected(spark, 1))

    # replaying the canonical tail is fenced (exactly-once still holds)
    assert apply_changes(table, generate_batch(spark, CANON, 3), "rg", epoch=3) is None


def test_rewind_is_idempotent_and_bounded(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=8)
    for b in range(3):
        apply_changes(table, generate_batch(spark, FORK, b), "rg", epoch=b)
    assert rewind_to_epoch(table, "rg", epoch=1) is not None
    # already at epoch 1 -> no-op
    assert rewind_to_epoch(table, "rg", epoch=1) is None
    assert rewind_to_epoch(table, "rg", epoch=5) is None  # ahead of head


def test_rewind_only_rewrites_touched_buckets(spark, tmp_path):
    """A later commit touching a key subset must not rewrite untouched
    buckets' files on rewind."""
    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=8)
    apply_changes(table, generate_batch(spark, FORK, 0), "rg", epoch=0)
    # batch touching ONE doc -> few buckets
    one = generate_batch(spark, FORK, 1).limit(1)
    apply_changes(table, one, "rg", epoch=1)
    before = dict(table.snapshot()["bucket_files"])
    info = rewind_to_epoch(table, "rg", epoch=0)
    assert info["buckets_reverted"] <= 2
    after = table.snapshot()["bucket_files"]
    untouched = [
        b for b in before
        if b not in {str(x) for x in table.snapshot()["commit_buckets"]}
    ]
    for b in untouched:
        assert after[b] == before[b]  # same file lists, not rewritten


def test_rewind_base_expired_raises(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=8)
    for b in range(4):
        apply_changes(table, generate_batch(spark, FORK, b), "rg", epoch=b)
    table.expire_snapshots(keep_last=1)
    try:
        rewind_to_epoch(table, "rg", epoch=0)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_tailer_reorg_end_to_end_with_derived_view(spark, tmp_path):
    """Full reorg flow through the tailer: fork feed applied, orphaned
    batch dirs replaced with canonical ones, rewind(1), replay — final
    state equals the canonical-chain fold and a riding NearDupIndex
    stays consistent through the rewind commit."""
    from ethereum_etl_airflow_spark.operators.lsh_index import NearDupIndex
    from ethereum_etl_airflow_spark.sources.feed import write_feed
    from ethereum_etl_airflow_spark.streaming.tailer import ChangeLogTailer

    feed = str(tmp_path / "feed")
    write_feed(spark, FORK, feed)
    tailer = ChangeLogTailer(spark, feed, str(tmp_path / "t"), app_id="rg", num_buckets=8)
    idx = NearDupIndex(
        tailer.table,
        str(tmp_path / "lsh"),
        tokens_of=lambda df: F.transform(F.col("tokens"), lambda t: t.cast("string")),
        num_buckets=8,
    )
    tailer.derived_views = [idx]
    tailer.replay_batches()

    # reorg at height 1: replace the orphaned batch dirs with canonical
    write_feed(spark, CANON, feed, batches=range(2, CANON.n_batches))
    assert tailer.rewind(1) is not None
    # the riding refresh caught the rewind commit
    assert idx.last_target_version() == tailer.table.current_version()

    applied = tailer.replay_batches()  # batches 0-1 fenced, 2-3 re-apply
    assert [li["epoch"] for li in applied] == [2, 3]
    assert canon_state(tailer.table.read()) == canon_state(_mixed_expected(spark, 1))
    # index equals a from-scratch rebuild of the post-reorg corpus
    docs = idx._live_docs(idx.target.read_raw())
    want = {
        (r["b"], r["band_key"], r["ref_doc_id"]) for r in idx._bands(docs).collect()
    }
    got = {
        (r["b"], r["band_key"], r["ref_doc_id"])
        for r in idx.index.read().select("b", "band_key", "ref_doc_id").collect()
    }
    assert got == want


def test_rewind_across_schema_evolution_boundary(spark, tmp_path):
    """Reorg below an evolve point: the restored buckets hold
    pre-evolution files, the table schema stays at head (old rows read
    with null lang), and re-applied evolved batches converge."""
    evo = FeedConfig(
        n_docs=100, events_per_batch=250, n_batches=4, dup_tail=0,
        seed=7, evolve_at_batch=2,
    )
    table = SnapshotTable(spark, str(tmp_path / "t"), num_buckets=8)
    for b in range(evo.n_batches):
        apply_changes(table, generate_batch(spark, evo, b), "rg", epoch=b)
    assert "lang" in table.read().columns

    assert rewind_to_epoch(table, "rg", epoch=1) is not None
    # restored state = pre-evolution fold; lang survives in the schema
    # but is null everywhere (no evolved rows remain)
    post = table.read()
    assert "lang" in post.columns
    assert post.where(F.col("lang").isNotNull()).count() == 0
    from ethereum_etl_airflow_spark.sources.feed import lww_expected_state

    assert canon_state(post.drop("lang")) == canon_state(
        lww_expected_state(spark, evo, 1)
    )

    # evolved batches re-apply and the full-feed oracle holds again
    for b in range(2, evo.n_batches):
        assert apply_changes(table, generate_batch(spark, evo, b), "rg", epoch=b) is not None
    assert canon_state(table.read()) == canon_state(
        lww_expected_state(spark, evo, evo.n_batches - 1)
    )


def test_stream_resume_after_rewind_rotates_checkpoint(spark, tmp_path):
    """The r3 caveat, closed: after a rewind, corrected batch dirs that
    REUSE orphaned paths must be re-read by run_stream with the SAME
    checkpoint dir — the rewind commit bumps stream_gen, run_stream
    rotates to a fresh generation subdir + fence namespace, and the LWW
    fold keeps the forced re-read idempotent."""
    import os

    from ethereum_etl_airflow_spark.sources.feed import write_feed
    from ethereum_etl_airflow_spark.streaming.tailer import ChangeLogTailer

    feed, ckpt = str(tmp_path / "feed"), str(tmp_path / "ck")
    write_feed(spark, FORK, feed)
    tailer = ChangeLogTailer(spark, feed, str(tmp_path / "t"), app_id="rg", num_buckets=8)
    tailer.replay_batches()
    # switch to follow mode: the gen-0 stream checkpoint marks every
    # current batch path as SEEN (state unchanged — LWW no-op)
    tailer.run_stream(ckpt)
    # generation 0 uses the caller's dir verbatim (pre-generation
    # checkpoints stay valid); only post-rewind generations get subdirs
    assert not os.path.isdir(os.path.join(ckpt, "gen-0"))
    assert os.path.isdir(os.path.join(ckpt, "offsets"))
    fork_all = generate_batch(spark, FORK, 0)
    for b in range(1, FORK.n_batches):
        fork_all = fork_all.unionByName(generate_batch(spark, FORK, b))
    assert canon_state(tailer.table.read()) == canon_state(_fold(fork_all))

    # reorg at height 1: corrected canonical batches land at the SAME
    # paths the orphaned fork batches used
    write_feed(spark, CANON, feed, batches=range(2, CANON.n_batches))
    assert tailer.rewind(1) is not None

    # resume with the SAME checkpoint dir — no manual surgery
    tailer.run_stream(ckpt)
    assert os.path.isdir(os.path.join(ckpt, "gen-1"))
    assert canon_state(tailer.table.read()) == canon_state(_mixed_expected(spark, 1))

    # a further resume of the new generation is a clean no-op
    v = tailer.table.current_version()
    tailer.run_stream(ckpt)
    assert canon_state(tailer.table.read()) == canon_state(_mixed_expected(spark, 1))
    assert tailer.table.current_version() == v


def test_rewind_to_seq_stream_only_ingest(spark, tmp_path):
    """Pure stream-mode reorg: no replay fences exist (epochs are Spark
    batchIds), so the rewind targets a CHAIN HEIGHT via the per-commit
    offset_range lineage. Corrected dirs land at reused paths; resume
    with the same checkpoint dir converges via generation rotation."""
    from ethereum_etl_airflow_spark.sources.feed import write_feed
    from ethereum_etl_airflow_spark.streaming.tailer import ChangeLogTailer

    feed, ckpt = str(tmp_path / "feed"), str(tmp_path / "ck")
    write_feed(spark, FORK, feed, batches=range(0, 2))
    tailer = ChangeLogTailer(spark, feed, str(tmp_path / "t"), app_id="rg", num_buckets=8)
    tailer.run_stream(ckpt)
    S = generate_batch(spark, FORK, 1).agg(F.max("seq")).first()[0]
    # stream-mode only: the replay fence never advanced
    assert tailer.table.last_epoch("rg") == -1

    write_feed(spark, FORK, feed, batches=range(2, FORK.n_batches))
    tailer.run_stream(ckpt)
    fork_all = generate_batch(spark, FORK, 0)
    for b in range(1, FORK.n_batches):
        fork_all = fork_all.unionByName(generate_batch(spark, FORK, b))
    assert canon_state(tailer.table.read()) == canon_state(_fold(fork_all))

    # reorg: every event above height S is orphaned; corrected batches
    # REUSE the orphaned dirs' paths
    write_feed(spark, CANON, feed, batches=range(2, CANON.n_batches))
    info = tailer.rewind_to_seq(S)
    assert info is not None
    fork01 = generate_batch(spark, FORK, 0).unionByName(
        generate_batch(spark, FORK, 1)
    )
    assert canon_state(tailer.table.read()) == canon_state(_fold(fork01))

    # same checkpoint dir, no surgery: the bumped generation re-reads
    tailer.run_stream(ckpt)
    assert canon_state(tailer.table.read()) == canon_state(_mixed_expected(spark, 1))
    # nothing above the canonical head -> rewind is a no-op
    assert tailer.rewind_to_seq(10**12) is None
