"""CDC-maintained MinHash-LSH band index: near-dup admission control
that stays O(batch) forever.

``dedup_minhash_lsh`` is the nightly full-corpus job;
``dedup_incremental_lsh`` showed the probe plan against a band index.
This operator closes the loop the way a 10^10-document ingest needs it
closed: the band index is a real :class:`SnapshotTable`, maintained
INCREMENTALLY from the corpus table's snapshot diffs (the same
machinery as :class:`operators.index.SecondaryIndex`, which indexes a
scalar column — this indexes the ~``LSH_BANDS`` MinHash band keys of
each document's token stream):

* index rows map ``(band, band_key) -> referencing doc_ids`` and are
  hash-bucketed by the band key, so a probe prunes its index read to
  the buckets its own band keys hash into — O(files-per-bucket),
  independent of index size;
* ``refresh()`` diffs the corpus between the index's last-seen version
  and the current one (bucket-pruned, rebucket-aware, retention-safe),
  re-shingles ONLY changed documents, and commits the band-set
  symmetric difference: bands the old text had and the new lacks are
  tombstoned, bands the new text gains are inserted, bands both share
  are NOT rewritten (rewriting them would race a tombstone and an
  insert of the same key at the same ``_seq`` — fold_lww would pick an
  arbitrary winner);
* exactly-once via the corpus-version epoch fence, like every other
  derived-table edge in the engine;
* ``probe(batch)`` computes the incoming batch's signatures (one
  narrow fold, no shuffle), prunes the index read to the batch's band
  buckets, and returns ``(doc_new, doc_existing)`` near-dup candidates
  through the shared :func:`functions.dedup.probe_lsh_index` kernel —
  exact-Jaccard verification stays with the caller, which has the
  batch text in hand.

Reference parity: the reference's partitioned by-topic tables exist to
make "find related rows" O(partition) instead of O(table)
(build_partition_dag.py:112-146); this is the near-duplicate analogue
for the training-data pipeline. SURVEY §2.7 M2 ingest path.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable, bucket_expr

#: key separator — unit separator, not expected inside band keys
SEP = "\x1f"


def _default_tokens(df: DataFrame) -> Column:
    return F.split(F.col("text"), " ")


class NearDupIndex:
    """MinHash-LSH band index over a corpus table's token streams.

    ``tokens_of`` maps the corpus DataFrame to an ``array<string>``
    token column (default: whitespace-split ``text``; for the
    tokenized-sequence CDC contract pass
    ``lambda df: F.transform("tokens", lambda t: t.cast("string"))``).
    Documents with fewer than 3 tokens have no 3-gram shingles and are
    not indexed (same rule as the batch dedup queries).
    """

    def __init__(
        self,
        target: SnapshotTable,
        root: str,
        tokens_of: Callable[[DataFrame], Column] = _default_tokens,
        num_buckets: int = 16,
    ):
        self.target = target
        self.tokens_of = tokens_of
        self.index = SnapshotTable(target.spark, root, num_buckets=num_buckets)
        self._app = "lsh_index"

    def last_target_version(self) -> int:
        return self.index.last_epoch(self._app)

    # ---------------------------------------------------------------- kernels

    def _live_docs(self, df: DataFrame) -> DataFrame:
        """(ref_doc_id, toks) for live rows with enough tokens to shingle."""
        live = df.where(~F.coalesce(F.col("_tombstone"), F.lit(False)))
        toks = self.tokens_of(live)
        return live.select(
            F.col("doc_id").alias("ref_doc_id"), toks.alias("toks")
        ).where(F.size("toks") >= 3)

    def _bands(self, docs: DataFrame) -> DataFrame:
        """(ref_doc_id, b, band_key) — one narrow fold per doc, no shuffle."""
        from ethereum_etl_airflow_spark.functions.dedup import (
            lsh_bands,
            minhash_sig_col,
            shingles_col,
        )

        sh = docs.select(
            F.col("ref_doc_id").alias("doc_id"),
            shingles_col(F.col("toks")).alias("sh"),
        )
        sigs = sh.select("doc_id", minhash_sig_col("sh").alias("sig"))
        return lsh_bands(sigs).withColumnRenamed("doc_id", "ref_doc_id")

    # ---------------------------------------------------------------- refresh

    def refresh(self) -> dict | None:
        """Advance the index to the corpus's current version; commit the
        band-set symmetric difference of changed documents. Returns
        commit info or None when already current."""
        from_v = self.last_target_version()
        to_v = self.target.current_version()
        if to_v <= from_v:
            return None
        try:
            touched: set[int] = set()
            for v in range(from_v + 1, to_v + 1):
                touched.update(self.target.snapshot(v).get("commit_buckets", []))
            buckets: list[int] | None = sorted(touched)
            # bucket ids are layout-relative: a rebucket inside the
            # range invalidates pruning (operators/index.py discipline)
            if from_v >= 0 and self.target.snapshot(from_v).get(
                "num_buckets"
            ) != self.target.snapshot(to_v).get("num_buckets"):
                buckets = None
            old = (
                self._live_docs(self.target.read_raw(buckets, version=from_v))
                if from_v >= 0
                else None
            )
        except FileNotFoundError:
            # diff base expired by retention -> full rebuild
            buckets, old = None, None
        new = self._live_docs(self.target.read_raw(buckets, version=to_v))

        if old is None:
            adds, drops = self._bands(new), None
            replace_all = True
        else:
            o, n = old.alias("o"), new.alias("n")
            joined = o.join(
                n, F.col("o.ref_doc_id") == F.col("n.ref_doc_id"), "full_outer"
            )
            # re-shingle ONLY docs whose token stream changed/appeared/
            # vanished — O(changes) shingling, never O(corpus)
            changed_old = joined.where(
                F.col("o.ref_doc_id").isNotNull()
                & (
                    F.col("n.ref_doc_id").isNull()
                    | (F.col("n.toks") != F.col("o.toks"))
                )
            ).select(
                F.col("o.ref_doc_id").alias("ref_doc_id"),
                F.col("o.toks").alias("toks"),
            )
            changed_new = joined.where(
                F.col("n.ref_doc_id").isNotNull()
                & (
                    F.col("o.ref_doc_id").isNull()
                    | (F.col("o.toks") != F.col("n.toks"))
                )
            ).select(
                F.col("n.ref_doc_id").alias("ref_doc_id"),
                F.col("n.toks").alias("toks"),
            )
            old_b, new_b = self._bands(changed_old), self._bands(changed_new)
            key = ["ref_doc_id", "b", "band_key"]
            # symmetric difference: shared band keys stay live untouched
            drops = old_b.join(new_b, key, "left_anti")
            adds = new_b.join(old_b, key, "left_anti")
            replace_all = False

        def rows(bands: DataFrame, tombstone: bool) -> DataFrame:
            return bands.select(
                F.concat(
                    F.col("b").cast("string"),
                    F.lit(":"),
                    F.col("band_key"),
                    F.lit(SEP),
                    F.col("ref_doc_id").cast("string"),
                ).alias("doc_id"),
                F.lit(to_v).cast("long").alias("_seq"),
                F.lit(to_v).cast("long").alias("_epoch"),
                F.lit(tombstone).alias("_tombstone"),
                F.col("b").cast("int").alias("b"),
                "band_key",
                F.col("ref_doc_id").cast("string").alias("ref_doc_id"),
            )

        delta = rows(adds, False)
        if drops is not None:
            delta = delta.unionByName(rows(drops, True))
        out = delta.withColumn(
            # bucket by (band, band_key): a probe prunes to its keys' buckets
            "_bucket",
            bucket_expr(
                F.concat(F.col("b").cast("string"), F.lit(":"), F.col("band_key")),
                self.index.num_buckets,
            ),
        )
        snap = self.index.commit(
            out,
            replace_buckets=set(range(self.index.num_buckets)) if replace_all else set(),
            app_id=self._app,
            epoch=to_v,
            new_schema=out.drop("_bucket").schema,
            lineage={
                "op": "lsh_index_refresh",
                "from_version": from_v,
                "to_version": to_v,
            },
        )
        return {
            "from_version": from_v,
            "to_version": to_v,
            "index_version": snap["version"],
        }

    # ------------------------------------------------------------------ probe

    def probe(self, batch: DataFrame) -> DataFrame:
        """Near-dup candidates ``(doc_new, doc_existing)`` for an
        incoming batch: one signature fold over the BATCH, an index
        read pruned to the batch's band buckets (≤ ``num_buckets``
        driver-side ints — bounded collect), and the shared band-key
        equality join. Work is O(batch bands + matching index files);
        the corpus is never re-shingled."""
        from ethereum_etl_airflow_spark.functions.dedup import probe_lsh_index

        docs = batch.select(
            F.col("doc_id").alias("ref_doc_id"), self.tokens_of(batch).alias("toks")
        ).where(F.size("toks") >= 3)
        pb = self._bands(docs).localCheckpoint()  # batch-sized, reused twice
        probe_bands = pb.select(
            F.col("ref_doc_id").alias("doc_id"), "b", "band_key"
        )
        bucket_ids = [
            r[0]
            for r in pb.select(
                bucket_expr(
                    F.concat(F.col("b").cast("string"), F.lit(":"), F.col("band_key")),
                    self.index.num_buckets,
                ).alias("bkt")
            )
            .distinct()
            .collect()
        ]
        idx = self.index.read(buckets=sorted(bucket_ids)).select(
            F.col("ref_doc_id").alias("doc_id"), "b", "band_key"
        )
        return probe_lsh_index(probe_bands, idx)
