"""Physical-plan regression tests: lock the plan properties that make
the scale-critical queries viable at 100 TB.

`scripts/plan_audit.py` documents these properties as an artifact;
this suite ASSERTS the load-bearing subset so a refactor that quietly
adds a shuffle, un-pushes a filter, widens a scan, or drops a
pipeline into per-row Python fails CI instead of failing the cluster.

Bounds are ceilings, not exact counts: AQE may legally REMOVE an
exchange at runtime, never add one, so `<=` is the stable invariant.
"""

from __future__ import annotations

import re

import pytest

from ethereum_etl_airflow_spark.queries import get_queries

SF = "/root/testdata/sf0.001"

#: query -> ceilings / requirements on the unexecuted formatted plan.
#: max_exchanges: shuffles (each is a cluster-wide data move);
#: max_scans: parquet scans (ledger queries must stay single-scan);
#: max_read_cols: widest ReadSchema (column-pruning evidence);
#: need_pushed: at least one scan with non-empty PushedFilters;
#: max_python: Arrow/Python nodes (0 = stays in JVM codegen).
EXPECTATIONS = {
    # narrow map-only pipelines: zero shuffles at ANY corpus size
    "corpus_chunk_overlap": dict(max_exchanges=0, max_python=0, max_scans=1),
    "text_redact_pii": dict(max_exchanges=0, max_python=0, max_scans=1),
    "text_token_stats": dict(max_exchanges=0, max_python=0, max_scans=1),
    "text_quality_score": dict(max_exchanges=0, max_python=0, max_scans=1),
    "scalar_functions_bundle": dict(max_exchanges=0, max_python=0, need_pushed=True),
    # folded ledgers: ONE scan of the fact table + one agg exchange
    # (the multi-branch UNION ALL rewrite must not reappear)
    "balances_ledger": dict(max_scans=1, max_exchanges=1, need_pushed=True, max_python=0),
    "pricing_summary": dict(max_scans=1, max_exchanges=1, need_pushed=True, max_read_cols=6),
    # single-shuffle aggregations
    "dedup_exact": dict(max_exchanges=1, max_python=0, max_read_cols=2),
    "cdc_lww_fold": dict(max_exchanges=1, max_python=0),
    "top_k_accounts": dict(max_exchanges=1, max_python=0, max_read_cols=2),
    # semi join: dim side broadcast, no fact shuffle
    "semi_join_in_subquery": dict(max_exchanges=0, need_pushed=True, max_python=0),
    # selector predicate must reach the parquet reader
    "bucket_pruning_filter": dict(need_pushed=True, max_read_cols=1),
    "parse_spec_log_decode": dict(need_pushed=True, max_python=0),
    # LSH dedup: the band join is the ONLY shuffle
    "dedup_minhash_lsh": dict(max_exchanges=1),
    # Z-order keys: a pure projection — zero shuffles, JVM-only
    "zorder_layout_key": dict(max_exchanges=0, max_python=0, max_scans=1, max_read_cols=3),
    # HLL: the register agg (1 exchange, <=64 rows cross the wire), the
    # 1-row register fold (1), and the exact-distinct audit's 2-phase
    # distinct (2) — every exchange is bounded by m or by |keys|
    "approx_distinct_hll": dict(max_exchanges=4, max_python=0, max_read_cols=1),
    # CMS: exact key agg + d*w counter agg; counters must come back
    # broadcast, never shuffle the keyed side again
    "sketch_cms_heavy_hitters": dict(max_exchanges=3, max_python=0, max_read_cols=1),
    # URL dedup: canonicalization is a narrow JVM map; the group-by on
    # the canonical string is the ONLY shuffle
    "url_canonical_dedup": dict(max_exchanges=1, max_python=0, max_scans=1, max_read_cols=2),
    # end-to-end corpus build: fingerprint dedup window + per-split
    # block window + final audit agg; filters/split stay fused narrow,
    # the packing offsets come back as a broadcast, never a shuffle
    "corpus_build_pipeline": dict(max_exchanges=4, max_python=0, max_scans=1, max_read_cols=3),
    # vocab encode: the learn step collects a BOUNDED top-V vocab at
    # build time; the returned encode plan is a pure narrow map with
    # the vocab as a literal MAP — zero shuffles at any corpus size
    "corpus_tokenize_vocab": dict(max_exchanges=0, max_python=0, max_scans=1, max_read_cols=2),
    # seeded shuffle: one exchange (the shard repartition for the
    # per-shard rank window) — never a global sort
    "corpus_shuffle_shards": dict(max_exchanges=1, max_python=0, max_scans=1, max_read_cols=1),
    # quarantine split: validation is a JVM CASE chain over ONE scan;
    # the only exchange is the per-reason count agg
    "cdc_quarantine_split": dict(max_exchanges=2, max_python=0, max_scans=1),
    # int8 quantize: pure per-row map — zero shuffles at any scale
    "embedding_quantize_int8": dict(max_exchanges=0, max_python=0, max_scans=1, max_read_cols=2),
    # PQ encode: the codebook is literal (bounded collect at build
    # time); the encode plan itself is a zero-shuffle scan-project
    "ann_pq_encode": dict(max_exchanges=0, max_python=0, max_scans=1, max_read_cols=2),
    # k-means iteration: assignment narrow, recompute = ONE shuffle of
    # K x (DIM+1) map-side-combined partials (never an N*DIM explode)
    "kmeans_assign_iter": dict(max_exchanges=1, max_python=0, max_scans=1, max_read_cols=2),
    # novelty curve: grams travel as 60-bit hashes, all-JVM; shuffles =
    # gram-hash agg + join-back + doc regroup (and their reused scans)
    "text_ngram_novelty": dict(max_python=0, max_read_cols=2, max_exchanges=4),
    # paragraph dedup: segmentation fused narrow; first-occurrence
    # window (1 exchange by paragraph content) + doc reassembly (1)
    "dedup_paragraph_exact": dict(
        max_exchanges=2, max_python=0, max_scans=1, max_read_cols=2
    ),
    # blocklist gate: the seed side is a BroadcastExchange (not counted
    # — no fact shuffle); exchanges = the countDistinct two-phase agg
    "domain_blocklist_filter": dict(
        max_exchanges=2, max_python=0, max_scans=1, max_read_cols=2
    ),
    # funnel: every events scan re-reads with its stage predicate
    # PUSHED and <=3 columns — never a cached wide scan; per-user MIN
    # aggs + stage joins bound the exchanges
    "events_funnel_conversion": dict(
        max_exchanges=6, max_python=0, need_pushed=True, max_read_cols=3
    ),
    # salted hot-key agg: exactly the two designed exchanges — partial
    # on (key, salt), final on key
    "agg_salted_hotkeys": dict(
        max_exchanges=2, max_python=0, max_scans=1, max_read_cols=3
    ),
    # ROLLUP lattice: Expand + ONE exchange computes all levels
    "events_rollup_totals": dict(
        max_exchanges=1, max_python=0, max_scans=1, max_read_cols=3
    ),
    # log2-histogram sketch: ONE data-bearing exchange (the <=64-cell
    # histogram agg); the cumsum window + rank-pick exchanges carry
    # only the histogram rows
    "sketch_histogram_quantiles": dict(
        max_exchanges=3, max_python=0, max_scans=1, max_read_cols=1
    ),
    # pivot with explicit values: single agg pass, no distinct pre-scan
    "events_pivot_daily": dict(
        max_exchanges=2, max_python=0, max_scans=1, max_read_cols=2
    ),
    # cohort retention: custkey agg + co-partitioned join-back + the
    # distinct-actives agg on the tiny (cohort, offset) grid
    "orders_cohort_retention": dict(
        max_exchanges=3, max_python=0, max_read_cols=2
    ),
    # envelope ingest: from_json decode is a narrow JVM map over ONE
    # scan; the LWW fold is the only exchange
    "cdc_envelope_parse": dict(
        max_exchanges=1, max_python=0, max_scans=1, need_pushed=True
    ),
    "cdc_envelope_schema_audit": dict(
        max_exchanges=1, max_python=0, max_scans=1, need_pushed=True
    ),
    # audio energy: the window fan-out stays INSIDE one Arrow kernel —
    # zero shuffles, one scan, exactly one Python node
    "multimodal_audio_energy": dict(
        max_exchanges=0, max_python=1, max_scans=1, max_read_cols=2
    ),
    # BM25: term filter lands below the tf shuffle (pushed isin);
    # dfreq + corpus scalars broadcast; final top-k never global-sorts
    "bm25_search_topk": dict(
        max_exchanges=7, max_python=0, max_scans=4, max_read_cols=2
    ),
    # gap-fill: per-(series,bucket) agg + the per-series LOCF window
    "events_gapfill_locf": dict(
        max_exchanges=2, max_python=0, max_read_cols=4
    ),
    # PageRank step x2: the checkpointed edge set is computed ONCE
    # (scan count 0 in the final plan); each step = outdeg agg + inflow
    # agg over it
    "pagerank_iteration": dict(max_exchanges=5, max_python=0),
    # span corruption: stateless hash span membership — the whole
    # (input, target) rewrite is ONE codegen projection, no explode
    "corpus_span_corruption": dict(
        max_exchanges=0, max_python=0, max_scans=1, max_read_cols=2
    ),
    # leak audit: fingerprint agg (3 bit flags wide) + scalar roll-up
    "split_leakage_report": dict(
        max_exchanges=2, max_python=0, max_scans=1, max_read_cols=2
    ),
    # SCD2 intervals: ONE key exchange feeding the lead() window —
    # same plan shape as the LWW fold
    "cdc_scd2_history": dict(
        max_exchanges=1, max_python=0, max_scans=1, max_read_cols=4
    ),
    # lateness audit: running-max window + per-key agg share the
    # user_id partitioning — Catalyst reuses the exchange
    "cdc_out_of_order_audit": dict(
        max_exchanges=1, max_python=0, max_scans=1, max_read_cols=3
    ),
    # CUBE lattice: one Expand + one exchange, like the ROLLUP sibling
    "events_cube_slice": dict(
        max_exchanges=1, max_python=0, max_scans=1, max_read_cols=3
    ),
    # blocked Levenshtein: the fp self-join is the only data move
    # (2 exchanges = both join sides; the block-cap count window
    # shares the fp partitioning), verify stays JVM codegen
    "dedup_edit_distance": dict(
        max_exchanges=2, max_python=0, max_scans=2, max_read_cols=2
    ),
    # exact EWMA: one key exchange feeds the frame window; the Horner
    # fold and the single divide are codegen projections
    "events_ewma_exact": dict(
        max_exchanges=1, max_python=0, max_scans=1, max_read_cols=3
    ),
    # hybrid RRF: each leg bounded top-K before its rank window; the
    # fusion join moves <= 2*LEG_K rows
    "retrieval_hybrid_rrf": dict(max_exchanges=8, max_python=0),
    # triangle count: edges/oriented are checkpointed leaves, so the
    # multi-reference DAG stays ~6 exchanges instead of re-expanding
    "graph_triangle_count": dict(max_exchanges=8, max_python=0),
    # lateness histogram (two-phase scan): chunk agg + tiny prefix
    # window + per-chunk window + bucket agg — no single-task stage
    # over the full feed
    "cdc_lateness_histogram": dict(
        max_exchanges=5, max_python=0, max_read_cols=2
    ),
    # Q3 shape: segment dim broadcast (pushed filter), orders⋈lineitem
    # the lone shuffle pair, TakeOrdered top-k
    "orders_shipping_priority": dict(
        max_exchanges=3, max_python=0, need_pushed=True, max_read_cols=5
    ),
    # Q5 shape: supplier/nation/region chain broadcast; exchanges are
    # fact-sized only (custkey, orderkey, final 25-key agg)
    "regional_supplier_volume": dict(
        max_exchanges=5, max_python=0, need_pushed=True, max_read_cols=4
    ),
    # KN counts: bigram explode narrow; type-distinct is the only
    # corpus-sized shuffle, everything after is vocab-bounded
    "lm_kneser_ney_counts": dict(max_python=0, max_scans=3, max_read_cols=1),
    # PCA power step: projection fold + posexplode feed a map-side-
    # combined 64-key agg — ONE exchange, one scan, one column read
    "embedding_pca_power_iter": dict(
        max_exchanges=1, max_python=0, max_scans=1, max_read_cols=1
    ),
    # z-score anomalies: the day-grain agg runs once into a
    # checkpointed leaf (corpus scanned ONCE); series moments
    # broadcast back onto the tiny daily table
    "events_anomaly_zscore": dict(
        max_exchanges=3, max_python=0, max_scans=0, max_read_cols=0
    ),
    # snapshot diff: BOTH snapshot states fold in a single keyed
    # aggregate (conditional max/max_by) — one exchange, no self-join
    "cdc_snapshot_diff": dict(
        max_exchanges=2, max_python=0, max_scans=2, max_read_cols=3
    ),
    # Q16 shape: exclusion anti-join + part dim both broadcast; the
    # distinct-agg is the lone fact-sized exchange pair
    "part_supplier_diversity": dict(
        max_exchanges=2, max_python=0, need_pushed=True, max_read_cols=3
    ),
    # SemDeDup: assignment is a checkpointed zero-scan leaf (corpus
    # read once); the within-cluster self-join + prune-distinct +
    # verdict join are the only moves, all JVM
    "semdedup_cluster_prune": dict(
        max_exchanges=6, max_python=0, max_scans=0, max_read_cols=0
    ),
    # Q4 shape: correlated EXISTS decorrelated to one semi-join pair
    # with the quarter predicate pushed to the orders scan
    "orders_priority_exists": dict(
        max_exchanges=4, max_python=0, need_pushed=True, max_read_cols=3
    ),
    # boilerplate strip: segment narrow; df agg + join share the
    # content key; reassembly is the one doc-keyed shuffle
    "text_boilerplate_strip": dict(
        max_exchanges=5, max_python=0, max_scans=2, max_read_cols=2
    ),
    # LP step: edges checkpointed (cells subtree computes once);
    # votes agg is the one edge-sized exchange (neighbor label is
    # arithmetic — no label join); argmax window reuses it
    "graph_label_prop_step": dict(
        max_exchanges=2, max_python=0, max_scans=0, max_read_cols=0
    ),
    # Pareto cumshare: customer-rev agg + the nation-partitioned
    # windows; both window passes share one exchange
    "orders_pareto_cumshare": dict(
        max_exchanges=5, max_python=0, max_scans=2, max_read_cols=2
    ),
    # temperature weights: source-grain leaf (corpus scanned once into
    # the checkpoint) + a 1-row broadcast total
    "corpus_temperature_weights": dict(
        max_exchanges=2, max_python=0, max_scans=0, max_read_cols=0
    ),
    # Q14 shape: part broadcasts, both conditional sums ride ONE agg
    # pass — the only shuffle is the <=84-key month group-agg
    "promo_revenue_share": dict(
        max_exchanges=1, max_python=0, max_scans=2, max_read_cols=4
    ),
    # Q12 shape: the orderkey join both sides need anyway (<=2 fact
    # exchanges; AQE may broadcast the smaller fact) + the 3-key
    # conditional agg; lateness filter fused post-join, no extra pass
    "late_lines_by_priority": dict(
        max_exchanges=3, max_python=0, max_scans=2, max_read_cols=4
    ),
    # Q19 shape: the In(p_brand...) conjunct extracted from the
    # disjunction MUST reach a scan; part broadcasts; the group-agg is
    # the only shuffle
    "brand_band_disjunctive": dict(
        max_exchanges=1, max_python=0, max_scans=2, need_pushed=True
    ),
    # fertility: both token counters in one narrow map over one scan;
    # the <=|sources|-key agg is the only shuffle
    "tokenizer_fertility_stats": dict(
        max_exchanges=1, max_python=0, max_scans=1, max_read_cols=3
    ),
    # norm z-test: norms checkpointed (table scanned once), 1-row
    # moment triple broadcasts back — the moment agg is the only
    # shuffle
    "embedding_norm_outliers": dict(
        max_exchanges=1, max_python=0, max_scans=0
    ),
    # exact KS: counts checkpointed leaf; everything downstream runs
    # on the |sources| x |lengths| grid (gtot/srcs aggs, per-source
    # ECDF window, final max agg)
    "quality_ks_drift": dict(max_exchanges=4, max_python=0, max_scans=0),
    # compaction planner: fact agg to file grain + the per-series
    # cumsum window — never a global sort
    "compaction_bin_packing": dict(
        max_exchanges=2, max_python=0, max_scans=1, max_read_cols=2
    ),
    # blockhash: ONE deliberate Arrow stage hashes every payload
    # (narrow); the collision window on the 60-bit hash is the only
    # shuffle and it carries 8-byte rows
    "multimodal_blockhash_dedup": dict(
        max_exchanges=1, max_python=1, max_scans=1
    ),
    # full changelog: BOTH states + the pre/post fan-out ride the ONE
    # keyed-aggregate exchange (explode over the agg output — no join
    # back, no second scan)
    # (2 = the keyed agg + the 1-row cut aggregate's single-partition
    # exchange, same budget as cdc_snapshot_diff)
    "cdc_changelog_images": dict(
        max_exchanges=2, max_python=0, max_scans=2, max_read_cols=4
    ),
    # column-level patch fold: every per-column FILTER'd max/max_by
    # rides one hash aggregate with map-side combine
    "cdc_column_patch_fold": dict(
        max_exchanges=1, max_python=0, max_scans=1, max_read_cols=5
    ),
    # txn gate: the commit flag is a max window over the txn partition
    # — one shuffle, vs the 2-exchange groupBy+join form
    "cdc_txn_boundary_filter": dict(
        max_exchanges=1, max_python=0, max_scans=1, max_read_cols=3
    ),
    # hard negatives: query side broadcast (vec_id<Q pushed to its
    # scan), label disequality in the join — the per-query top-k
    # window is the only shuffle
    "ann_hard_negatives": dict(
        max_exchanges=1, max_python=0, max_scans=2, need_pushed=True
    ),
    # safe watermark: one map-side-combined agg to bucket grain, the
    # global-min window runs over B=8 rows (its single-partition
    # exchange carries 8 rows — bounded, not fact-sized)
    "cdc_safe_watermark": dict(
        max_exchanges=2, max_python=0, max_scans=1, max_read_cols=2
    ),
    # winnowing: pure per-doc projection (k-gram hash array, window
    # argmin, explode) — zero shuffles at any corpus size
    "text_winnow_fingerprints": dict(
        max_exchanges=0, max_python=0, max_scans=1, max_read_cols=2
    ),
    # vocab coverage: literal-array membership (the bounded top-V
    # collect happens at build time), one narrow map + the
    # <=|sources|-key agg — one exchange, no join, no explode in the
    # coverage pass (the learn agg is the build-time collect's plan)
    "tokens_vocab_coverage": dict(
        max_exchanges=1, max_python=0, max_scans=1, max_read_cols=2
    ),
    # Q13 shape: priority filter pushed below the outer join; the
    # per-customer count reuses the join's custkey partitioning, so
    # the only exchanges are the join pair... and the tiny histogram
    "orders_count_distribution": dict(
        max_exchanges=3, max_python=0, max_scans=2, need_pushed=True,
        max_read_cols=3,
    ),
    # Q21 shape: ONE orderkey join; the (order,supp) agg and the
    # per-order census WINDOW both reuse its partitioning (the agg +
    # join-back form would recompute the fact join subtree twice)
    "suppliers_sole_late": dict(
        max_exchanges=3, max_python=0, max_scans=3, need_pushed=True,
        max_read_cols=3,
    ),
    # Q22 shape: 1-row threshold broadcast; recent orders date-pruned
    # AT THE SCAN before the anti join
    "idle_customers_above_avg": dict(
        max_exchanges=3, max_python=0, max_scans=3, need_pushed=True,
        max_read_cols=3,
    ),
    # Q15 shape: quarter predicate pushed; one suppkey agg exchange;
    # MAX and supplier both broadcast
    "top_revenue_suppliers": dict(
        max_exchanges=3, max_python=0, max_scans=3, need_pushed=True,
        max_read_cols=4,
    ),
    # DSIR: same shape as text_unigram_surprisal — term agg (raw +
    # target counts in ONE conditional pass), 1-row totals broadcast,
    # dictionary join back, per-doc agg
    "dsir_importance_weights": dict(
        max_exchanges=4, max_python=0, max_scans=3, max_read_cols=3
    ),
    # Gopher census: all rule booleans from array combinators in one
    # narrow JVM map (no explode); the |sources|-key agg is the only
    # shuffle
    "quality_gopher_census": dict(
        max_exchanges=1, max_python=0, max_scans=1, max_read_cols=2
    ),
    # greedy k-center: qe/d1/d2 are checkpointed leaves (table scans
    # ONCE; naive DAG re-expansion hit 31 scans); remaining exchanges
    # carry 1-row scalar aggregates + the ≤K-group census
    "kcenter_coreset_select": dict(
        max_exchanges=4, max_python=0, max_scans=0
    ),
    # MinHash calibration: signature fold shuffle-free per doc, band
    # self-join + sig join-backs broadcast at the candidate grain
    "minhash_estimate_audit": dict(max_exchanges=2, max_python=0),
    # salted join: fact salt is a narrow map, dim replication an
    # inline explode — the group-agg is the only fact-sized exchange
    "join_salted_skew": dict(
        max_exchanges=2, max_python=0, max_scans=2, max_read_cols=3
    ),
    # Q17 shape: brand filter rides the broadcast dim; the per-part
    # (sum,count) is a WINDOW over partkey (one fact scan, one
    # exchange) + the 1-row final agg — the correlated form would
    # rescan per outer row
    "small_qty_avg_revenue": dict(
        max_exchanges=2, max_python=0, max_scans=2, max_read_cols=3
    ),
    # Q18 shape: the HAVING gate applies AT the per-order aggregate,
    # so the two joins move only surviving (~0.2%) rows
    "large_volume_customers": dict(max_exchanges=5, max_python=0, max_scans=3),
    # Q11 shape: one partkey agg; the scalar (count,total) broadcasts
    # back — the fact table is scanned once
    "part_revenue_concentration": dict(
        max_exchanges=4, max_python=0, max_scans=1, max_read_cols=3
    ),
    # Q2 shape: (part,supp) agg + partkey window (the grain change is
    # the only second exchange); both dims broadcast
    "part_min_cost_supplier": dict(max_exchanges=3, max_python=0, max_read_cols=3),
    # Q20 shape: (part,supp) agg + partkey window + supplier census —
    # every exchange carries aggregates, never raw lines
    "excess_share_suppliers": dict(max_exchanges=3, max_python=0, max_read_cols=3),
    # LSH skew census: signature fold + band explode are narrow; the
    # two aggregates carry counts, never documents
    "lsh_band_skew_profile": dict(
        max_exchanges=2, max_python=0, max_scans=1, max_read_cols=2
    ),
    # Q6 shape: every predicate at the scan, zero joins, 1-row fold
    "forecast_revenue_change": dict(
        max_exchanges=1, max_python=0, max_scans=1, need_pushed=True,
        max_read_cols=4,
    ),
    # Q7/Q8/Q9 star shapes: dims broadcast (nation filters applied
    # INSIDE the dims), one lineitem⋈orders exchange pair + the
    # bounded group agg
    "nation_pair_volume": dict(max_exchanges=3, max_python=0),
    "nation_market_share": dict(max_exchanges=3, max_python=0),
    "nation_profit_by_year": dict(max_exchanges=3, max_python=0, need_pushed=True),
    # Q10 shape: join pair + customer join + agg + the global top-k cut
    "returned_item_top_customers": dict(max_exchanges=6, max_python=0, need_pushed=True),
    # packed-window emit: zero-shuffle vocab encode, the two-phase
    # prefix sum's per-block window, and ONE seq_id assembly shuffle —
    # never a global sort; JVM-only end to end, scan reads (doc_id, text)
    "corpus_pack_emit": dict(
        max_exchanges=4, max_python=0, max_scans=2, max_read_cols=2
    ),
    # ExactSubstr strip: spans travel as 8-byte hashes (dup window +
    # per-doc regroup + join back are the only shuffles); the interval
    # merge + gap-slice rebuild is a JVM-only narrow projection and the
    # scan reads exactly (doc_id, text)
    "dedup_substring_strip": dict(
        max_exchanges=4, max_python=0, max_scans=4, max_read_cols=2
    ),
    # fastText-style hashed classifier gate: the weight "table" is a
    # hash function, so scoring is fused aggregate folds — no join, no
    # explode, no shuffle, scan reads exactly (doc_id, text)
    "quality_hashed_linear_score": dict(
        max_exchanges=0, max_python=0, max_scans=1, max_read_cols=2
    ),
    # FIM PSM reordering: pure concat-of-slices projection — the whole
    # rewrite must stay one codegen map with no shuffle at any scale
    "corpus_fim_transform": dict(
        max_exchanges=0, max_python=0, max_scans=1, max_read_cols=2
    ),
    # held-out bigram scoring: ONE scan per corpus half — ctx/uni/tv
    # all reuse c2's shuffle (explicit notnull filters keep the four
    # model subtrees canonically identical so ReusedExchange fires at
    # runtime; audited on the AQE final plan). Scoring joins broadcast;
    # final per-doc agg — never a window or sort.
    "text_bigram_surprisal_backoff": dict(
        max_python=0, max_scans=2, max_read_cols=2, executed=True
    ),
    # hopping windows: the Expand (2 windows/row) feeds ONE partial+
    # final hash agg — a single shuffle carrying group count, not 2x
    # the events; no join, no window-sort, JVM-only, 3-col scan
    "events_hopping_window": dict(
        max_exchanges=1, max_python=0, max_scans=1, max_read_cols=3
    ),
    # multi-feed priority merge: union + ONE max_by hash agg (map-side
    # combine = the fold_lww skew defense); two scans of the feed
    # halves, never a window sort or self-join
    "cdc_multiplex_priority": dict(
        max_exchanges=1, max_python=0, max_scans=2, max_read_cols=2
    ),
}


@pytest.fixture(scope="module")
def plans(spark):
    qs = get_queries()
    out = {}
    for name in EXPECTATIONS:
        df = qs[name](spark, SF)
        if EXPECTATIONS[name].get("executed"):
            # audit the AQE FINAL plan: exchange reuse (ReusedExchange)
            # only materializes at runtime, so static scan counts
            # overstate what a multi-consumer plan actually reads.
            # collect() (not count(), which plans a separate Dataset)
            # finalizes THIS df's AdaptiveSparkPlan; sf0.001 is tiny.
            df.collect()
        p = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if EXPECTATIONS[name].get("executed"):
            p = _final_plan_only(p)
        out[name] = p
    return out


def _final_plan_only(p: str) -> str:
    """Restrict a post-execution formatted explain to the AQE final
    plan: keep the tree up to the '== Initial Plan ==' echo plus only
    the detail blocks for node ids that appear in that tree."""
    cut = p.find("== Initial Plan ==")
    if cut == -1:
        return p
    tree, rest = p[:cut], p[cut:]
    live = set(re.findall(r"\((\d+)\)", tree))
    kept = [
        blk
        for blk in rest.split("\n\n")
        if (m := re.match(r"\((\d+)\) ", blk)) and m.group(1) in live
    ]
    return tree + "\n\n" + "\n\n".join(kept)


def _audit(plan: str) -> dict:
    return {
        "scans": len(set(re.findall(r"\((\d+)\) Scan parquet", plan))),
        "pushed": len(re.findall(r"PushedFilters: \[(?!\])", plan)),
        "exchanges": len(set(re.findall(r"\((\d+)\) Exchange", plan))),
        "python": len(
            set(
                re.findall(
                    r"\((\d+)\) (?:MapInPandas|FlatMapGroupsInPandas|"
                    r"FlatMapCoGroupsInPandas|ArrowEvalPython|BatchEvalPython)",
                    plan,
                )
            )
        ),
        "read_cols": max(
            (len(m.split(",")) for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)),
            default=0,
        ),
    }


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_plan_shape(name, plans):
    want = EXPECTATIONS[name]
    got = _audit(plans[name])
    if "max_exchanges" in want:
        assert got["exchanges"] <= want["max_exchanges"], (
            f"{name}: {got['exchanges']} shuffles > {want['max_exchanges']} allowed\n"
            + plans[name][:2000]
        )
    if "max_scans" in want:
        assert got["scans"] <= want["max_scans"], f"{name}: scan fan-out {got['scans']}"
    if "max_python" in want:
        assert got["python"] <= want["max_python"], (
            f"{name}: {got['python']} Python nodes crept into a JVM-only plan"
        )
    if "max_read_cols" in want:
        assert got["read_cols"] <= want["max_read_cols"], (
            f"{name}: reads {got['read_cols']} cols — column pruning regressed"
        )
    if want.get("need_pushed"):
        assert got["pushed"] >= 1, f"{name}: no PushedFilters reached the scan"
