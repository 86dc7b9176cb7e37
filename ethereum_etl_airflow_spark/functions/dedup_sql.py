"""Leaf module: the dedup operators' shared constants and DuckDB SQL
fragments (see veclib.py for the import-graph rule — registration
modules must not import names from each other at module top level;
``dedup.py`` and ``graph.py`` both build oracles from these).
"""

from __future__ import annotations

from ethereum_etl_airflow_spark.functions.hashing import (
    minhash_perm_sql,
    phash60_sql,
)

MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = MINHASH_K // LSH_BANDS
JACCARD_THRESHOLD = 0.5


_SHINGLES_SQL = """
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
               )) AS sh
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
"""


def _sig_sql() -> str:
    """DuckDB fragment computing the MinHash signature list from ``sh``."""
    hs = f"list_transform(sh, s -> {phash60_sql('s')})"
    return (
        f"list_transform(generate_series(0, {MINHASH_K - 1}), i -> "
        f"list_min(list_transform({hs}, xh -> {minhash_perm_sql('xh', 'i')})))"
    )


#: full MinHash+LSH verified-pairs query (doc_a, doc_b, n_common,
#: n_union) — the dedup_minhash_lsh oracle, reused by graph.py's
#: clustering oracle as its edge list
MINHASH_PAIRS_SQL = f"""
    WITH t AS ({_SHINGLES_SQL}),
    sig AS (
        SELECT doc_id, sh, {_sig_sql()} AS sig FROM t
    ),
    bands AS (
        SELECT doc_id, b,
               array_to_string(sig[{LSH_ROWS}*b + 1 : {LSH_ROWS}*b + {LSH_ROWS}], '-') AS band_key
        FROM sig, (SELECT unnest(generate_series(0, {LSH_BANDS - 1})) AS b)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           len(list_intersect(ta.sh, tb.sh)) AS n_common,
           len(list_distinct(ta.sh || tb.sh)) AS n_union
    FROM cand c
    JOIN t ta ON ta.doc_id = c.doc_a
    JOIN t tb ON tb.doc_id = c.doc_b
    WHERE len(list_intersect(ta.sh, tb.sh))::DOUBLE
              / len(list_distinct(ta.sh || tb.sh)) >= {JACCARD_THRESHOLD}
    """


def incremental_lsh_sql(batch_mod: int, batch_rem: int) -> str:
    """Oracle for the incremental near-dup probe: docs with
    ``doc_id % batch_mod == batch_rem`` are the incoming batch, the
    rest are the already-indexed corpus; candidates come from band-key
    equality across the two sides, verified by exact Jaccard."""
    return f"""
    WITH t AS ({_SHINGLES_SQL}),
    sig AS (
        SELECT doc_id, sh, {_sig_sql()} AS sig FROM t
    ),
    bands AS (
        SELECT doc_id, b,
               array_to_string(sig[{LSH_ROWS}*b + 1 : {LSH_ROWS}*b + {LSH_ROWS}], '-') AS band_key
        FROM sig, (SELECT unnest(generate_series(0, {LSH_BANDS - 1})) AS b)
    ),
    cand AS (
        SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_existing
        FROM bands n JOIN bands o
          ON n.b = o.b AND n.band_key = o.band_key
         AND n.doc_id % {batch_mod} = {batch_rem}
         AND o.doc_id % {batch_mod} <> {batch_rem}
    )
    SELECT c.doc_new, c.doc_existing,
           len(list_intersect(tn.sh, te.sh)) AS n_common,
           len(list_distinct(tn.sh || te.sh)) AS n_union
    FROM cand c
    JOIN t tn ON tn.doc_id = c.doc_new
    JOIN t te ON te.doc_id = c.doc_existing
    WHERE len(list_intersect(tn.sh, te.sh))::DOUBLE
              / len(list_distinct(tn.sh || te.sh)) >= {JACCARD_THRESHOLD}
    """
