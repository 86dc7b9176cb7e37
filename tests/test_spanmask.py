"""Span-corruption invariants: the (input, target) pair must be a
lossless re-encoding of the original document.

The oracle equality check (test_queries_oracle) proves Spark and
DuckDB agree; these properties prove they agree on something CORRECT:

* zipping input and target back together (replacing each sentinel in
  the input with the tokens its target segment hides) reconstructs
  the original token sequence exactly;
* sentinel ordinals are 0..n_spans-1, in document order, identical
  between input and target;
* the masked-token arithmetic adds up (n_tokens = unmasked + masked).
"""

from __future__ import annotations

import re

from ethereum_etl_airflow_spark.functions.spanmask import span_corrupt
from ethereum_etl_airflow_spark.queries import _t

SF = "/root/testdata/sf0.001"
_SENT = re.compile(r"^<extra_id_(\d+)>$")


def _reconstruct(inp: list[str], tgt: list[str]) -> list[str]:
    """Splice target segments back into the input at each sentinel."""
    # target = [s0, hidden0..., s1, hidden1..., ...]
    segments: dict[int, list[str]] = {}
    cur = None
    for t in tgt:
        m = _SENT.match(t)
        if m:
            cur = int(m.group(1))
            segments[cur] = []
        else:
            assert cur is not None, "target token before first sentinel"
            segments[cur].append(t)
    out: list[str] = []
    for t in inp:
        m = _SENT.match(t)
        out.extend(segments[int(m.group(1))] if m else [t])
    return out


def test_roundtrip_and_ordinals(spark):
    from pyspark.sql import functions as F

    docs = _t(spark, SF, "documents")
    rows = (
        span_corrupt(docs, F.split("text", " "))
        .join(docs.select("doc_id", "text"), "doc_id")
        .collect()
    )
    assert rows
    saw_spans = False
    for r in rows:
        orig = r["text"].split(" ")
        assert _reconstruct(r["input_tokens"], r["target_tokens"]) == orig
        ids_inp = [
            int(m.group(1))
            for t in r["input_tokens"]
            if (m := _SENT.match(t))
        ]
        ids_tgt = [
            int(m.group(1))
            for t in r["target_tokens"]
            if (m := _SENT.match(t))
        ]
        assert ids_inp == list(range(r["n_spans"])) == ids_tgt
        n_unmasked = len(r["input_tokens"]) - r["n_spans"]
        assert n_unmasked + r["n_masked"] == r["n_tokens"]
        saw_spans = saw_spans or r["n_spans"] > 0
    assert saw_spans, "corpus produced no spans — rate check"
