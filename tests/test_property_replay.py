"""Property-based replay equivalence (Hypothesis): for ANY event
sequence — arbitrary ops, duplicate (doc_id, seq) re-emissions,
arbitrary batch splits, shuffled arrival order — applying batches
through the engine must equal the first-principles LWW fold.

This generalizes the reference's idempotency guarantee (re-running any
day converges — MERGE M1 semantics) from its fixed fixtures to the
whole input space (SURVEY §5: the reference has no property tests;
this is the engine's strongest correctness net)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ethereum_etl_airflow_spark.operators.cdc import apply_changes
from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable

SCHEMA = "op string, doc_id string, seq long, tokens array<int>, n_tok int, source string"

# a compact universe so collisions/duplicates/interleavings are common
DOC_IDS = ["a", "b", "c", "d"]


@st.composite
def event_log(draw):
    """An ordered event log with unique seq per event, then duplicated
    and split into batches."""
    n = draw(st.integers(min_value=1, max_value=24))
    events = []
    for seq in range(n):
        doc = draw(st.sampled_from(DOC_IDS))
        op = draw(st.sampled_from(["I", "U", "D"]))
        if op == "D":
            tokens, n_tok, source = None, None, None
        else:
            tokens = draw(st.lists(st.integers(0, 9), min_size=0, max_size=4))
            n_tok = len(tokens)
            source = draw(st.sampled_from(["web", "code"]))
        events.append((op, doc, seq, tokens, n_tok, source))
    # duplicate re-emissions (at-least-once): re-add a random subset
    dup_idx = draw(st.lists(st.integers(0, n - 1), max_size=5))
    dups = [events[i] for i in dup_idx]
    # split into 1-4 batches, each internally shuffled
    n_batches = draw(st.integers(1, 4))
    batches: list[list] = [[] for _ in range(n_batches)]
    for ev in events:
        batches[draw(st.integers(0, n_batches - 1))].append(ev)
    for ev in dups:
        batches[draw(st.integers(0, n_batches - 1))].append(ev)
    for b in batches:
        draw(st.permutations(b)) if len(b) > 1 else b
    return events, batches


def oracle_fold(events):
    """First-principles LWW fold in plain Python."""
    latest: dict[str, tuple] = {}
    for op, doc, seq, tokens, n_tok, source in events:
        cur = latest.get(doc)
        if cur is None or seq >= cur[2]:
            latest[doc] = (op, doc, seq, tokens, n_tok, source)
    return sorted(
        (d, tuple(t or []), nt, src)
        for (op, d, _s, t, nt, src) in latest.values()
        if op != "D"
    )


@given(event_log())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_any_event_log_replays_to_oracle_fold(spark, tmp_path_factory, case):
    events, batches = case
    root = str(tmp_path_factory.mktemp("prop") / "t")
    table = SnapshotTable(spark, root, num_buckets=4, compact_files=3)
    for epoch, batch in enumerate(batches):
        if not batch:
            continue
        df = spark.createDataFrame(batch, SCHEMA)
        apply_changes(table, df, "prop", epoch=epoch)
    got = sorted(
        (r.doc_id, tuple(r.tokens or []), r.n_tok, r.source)
        for r in table.read().select("doc_id", "tokens", "n_tok", "source").collect()
    )
    assert got == oracle_fold(events)


@st.composite
def reorg_case(draw):
    """A fork log split into batches, a rewind point, and a corrected
    tail for the batches above it."""
    n = draw(st.integers(min_value=2, max_value=20))
    events = []
    for seq in range(n):
        doc = draw(st.sampled_from(DOC_IDS))
        op = draw(st.sampled_from(["I", "U", "D"]))
        if op == "D":
            tokens, n_tok, source = None, None, None
        else:
            tokens = draw(st.lists(st.integers(0, 9), min_size=0, max_size=4))
            n_tok = len(tokens)
            source = draw(st.sampled_from(["web", "code"]))
        events.append((op, doc, seq, tokens, n_tok, source))
    # round-robin split guarantees every batch is non-empty
    nb = draw(st.integers(2, min(4, n)))
    batches = [events[i::nb] for i in range(nb)]
    rewind_at = draw(st.integers(0, len(batches) - 2))
    # corrected tail: same number of replacement batches, fresh events
    # whose seqs reuse the orphaned range (same heights, new content)
    orphaned = [ev for b in batches[rewind_at + 1:] for ev in b]
    seqs = sorted({ev[2] for ev in orphaned})
    corrected_events = []
    for seq in seqs:
        doc = draw(st.sampled_from(DOC_IDS))
        op = draw(st.sampled_from(["I", "U", "D"]))
        if op == "D":
            tokens, n_tok, source = None, None, None
        else:
            tokens = draw(st.lists(st.integers(0, 9), min_size=0, max_size=4))
            n_tok = len(tokens)
            source = draw(st.sampled_from(["web", "code"]))
        corrected_events.append((op, doc, seq, tokens, n_tok, source))
    n_tail = len(batches) - rewind_at - 1
    corrected_batches: list[list] = [[] for _ in range(n_tail)]
    for ev in corrected_events:
        corrected_batches[draw(st.integers(0, n_tail - 1))].append(ev)
    return batches, rewind_at, corrected_batches


@given(reorg_case())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_any_reorg_rewind_converges_to_canonical_fold(
    spark, tmp_path_factory, case
):
    """For ANY fork log, ANY rewind point, ANY corrected tail:
    apply fork -> rewind -> apply corrected == fold(kept ∪ corrected)."""
    from ethereum_etl_airflow_spark.operators.reorg import rewind_to_epoch

    batches, rewind_at, corrected_batches = case
    root = str(tmp_path_factory.mktemp("reorg") / "t")
    table = SnapshotTable(spark, root, num_buckets=4, compact_files=3)
    for epoch, batch in enumerate(batches):
        apply_changes(table, spark.createDataFrame(batch, SCHEMA), "prop", epoch=epoch)

    rewind_to_epoch(table, "prop", epoch=rewind_at)
    assert table.last_epoch("prop") <= rewind_at

    for i, batch in enumerate(corrected_batches):
        if not batch:
            continue
        df = spark.createDataFrame(batch, SCHEMA)
        apply_changes(table, df, "prop", epoch=rewind_at + 1 + i)

    kept = [ev for b in batches[: rewind_at + 1] for ev in b]
    corrected = [ev for b in corrected_batches for ev in b]
    got = sorted(
        (r.doc_id, tuple(r.tokens or []), r.n_tok, r.source)
        for r in table.read().select("doc_id", "tokens", "n_tok", "source").collect()
    )
    assert got == oracle_fold(kept + corrected)


# ---------------------------------------------------------------------------
# delete_where property: ANY event log x ANY delete range x both modes
# -> engine state == first-principles fold with the deletion applied,
# including post-delete feed behavior (stale events vs fresh events).
# ---------------------------------------------------------------------------

DEL_SCHEMA = "op string, doc_id string, seq long, eid long, val string"


@st.composite
def delete_case(draw):
    n = draw(st.integers(min_value=2, max_value=18))
    events = []
    for seq in range(n):
        doc = draw(st.sampled_from(DOC_IDS))
        op = draw(st.sampled_from(["I", "U", "D"]))
        eid = None if op == "D" else draw(st.integers(0, 50))
        val = None if op == "D" else draw(st.sampled_from(["x", "y", "z"]))
        events.append((op, doc, seq, eid, val))
    nb = draw(st.integers(1, 3))
    batches = [events[i::nb] for i in range(nb)]
    lo = draw(st.integers(0, 50))
    hi = lo + draw(st.integers(0, 25))
    tomb = draw(st.booleans())
    # post-delete events: seqs disjoint from the log's (stale = below
    # everything, fresh = above everything) so no (seq, epoch) tie
    # cases enter the model
    pool = draw(st.permutations(list(range(-6, 0)) + list(range(n, n + 6))))
    post = []
    for seq in pool[: draw(st.integers(0, 4))]:
        post.append(
            (
                draw(st.sampled_from(["I", "U"])),
                draw(st.sampled_from(DOC_IDS)),
                seq,
                draw(st.integers(0, 50)),
                "p",
            )
        )
    return events, batches, lo, hi, tomb, post


def _fold_simple(evs):
    latest: dict[str, tuple] = {}
    for op, doc, seq, eid, val in sorted(evs, key=lambda e: e[2]):
        cur = latest.get(doc)
        if cur is None or seq >= cur[1]:
            latest[doc] = (op, seq, eid, val)
    return latest


def _delete_model(events, lo, hi, tomb, post):
    pre = _fold_simple(events)
    state: dict[str, tuple] = {}
    for doc, (op, seq, eid, val) in pre.items():
        matches = op != "D" and eid is not None and lo <= eid <= hi
        if matches and tomb:
            state[doc] = ("D", seq, None, None)  # verdict pinned at the row's seq
        elif matches:
            pass  # physically gone, history and all
        else:
            state[doc] = (op, seq, eid, val)
    for op, doc, seq, eid, val in sorted(post, key=lambda e: e[2]):
        cur = state.get(doc)
        if cur is None or seq > cur[1]:
            state[doc] = (op, seq, eid, val)
    return sorted(
        (d, e, v) for d, (op, s, e, v) in state.items() if op != "D"
    )


@given(delete_case())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_delete_where_any_log_any_range(spark, tmp_path_factory, case):
    events, batches, lo, hi, tomb, post = case
    root = str(tmp_path_factory.mktemp("delprop") / "t")
    table = SnapshotTable(spark, root, num_buckets=4, stats_cols=["eid"])
    for epoch, batch in enumerate(batches):
        if not batch:
            continue
        apply_changes(
            table, spark.createDataFrame(batch, DEL_SCHEMA), "prop", epoch=epoch
        )
    table.delete_where("eid", lo=lo, hi=hi, tombstones=tomb)
    if post:
        apply_changes(
            table,
            spark.createDataFrame(post, DEL_SCHEMA),
            "prop",
            epoch=len(batches),
        )
    got = sorted(
        (r.doc_id, r.eid, r.val)
        for r in table.read().select("doc_id", "eid", "val").collect()
    )
    assert got == _delete_model(events, lo, hi, tomb, post)
