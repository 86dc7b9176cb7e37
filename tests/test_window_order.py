"""Guard: the driver's official-correctness window stays intact.

The driver records official CORRECTNESS rows for the FIRST 50
``get_queries()`` entries only.  ``WINDOW_ORDER`` curates that window
(one representative per operator family, flagship first) — but nothing
stopped a refactor from dropping a name, mistyping one (silently
skipped by ``_ordered_names``), or shrinking the curated head below
the driver's 50-row window.  This test makes those failures loud.
"""

from __future__ import annotations

from ethereum_etl_airflow_spark import queries as q

#: the driver samples exactly this many leading get_queries() entries
DRIVER_WINDOW = 50


def test_window_names_all_registered():
    missing = [n for n in q.WINDOW_ORDER if n not in q.REGISTRY]
    assert not missing, (
        f"WINDOW_ORDER names not registered (typo or dropped op): {missing}"
    )


def test_window_fills_driver_rows():
    assert len(q.WINDOW_ORDER) >= DRIVER_WINDOW, (
        f"curated window ({len(q.WINDOW_ORDER)}) no longer fills the "
        f"driver's {DRIVER_WINDOW} official rows — later registrations "
        "would drift in uncurated"
    )


def test_window_has_no_duplicates():
    assert len(set(q.WINDOW_ORDER)) == len(q.WINDOW_ORDER)


def test_window_is_the_get_queries_head():
    head = list(q.get_queries())[: len(q.WINDOW_ORDER)]
    assert head == q.WINDOW_ORDER


def test_window_families_present():
    """One representative from each pillar family must sit INSIDE the
    driver's 50-row window (the exact names are curated; this pins the
    family coverage so a reorder can't silently evict a pillar)."""
    window = set(q.WINDOW_ORDER[:DRIVER_WINDOW])
    required = {
        "balances_ledger",  # flagship (must also be FIRST — below)
        "parse_spec_log_decode",  # ABI decode surface
        "cdc_lww_fold",  # CDC fold
        "cdc_native_stream_chain",  # exactly-once streaming chain
        "sessionize_stream_closed",  # stateful streaming
        "dedup_minhash_lsh",  # near-dup dedup
        "ann_ivf_probed",  # similarity search
        "multimodal_decode_stats",  # multimodal
        "text_quality_score",  # text analysis
        "corpus_pack_sequences",  # corpus assembly
        "bpe_learn_merges",  # tokenization
        "sketch_cms_heavy_hitters",  # sketches
        "pagerank_iteration",  # graph
    }
    assert required <= window, f"evicted: {sorted(required - window)}"
    assert q.WINDOW_ORDER[0] == "balances_ledger"


def test_every_windowed_query_has_an_oracle():
    oracles = q.get_oracles()
    missing = [n for n in q.WINDOW_ORDER if n not in oracles]
    assert not missing, (
        f"window entries without oracle_sql (rows-only weak check): {missing}"
    )
