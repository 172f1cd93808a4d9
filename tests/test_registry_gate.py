"""The driver's correctness gate samples the first 50 registry entries;
pin that the gated window covers every operator family and that the
rotation policy holds (queries.py `_DEMOTED` rationale): new/changed
operators sit inside the window, and previously demoted entries rotate
back in so the driver re-verifies them round over round."""

from cdc_data_lake_pyspark_spark import queries as q

GATE_WINDOW = 50

# One representative per operator family that MUST sit inside the gate.
REQUIRED_VISIBLE = [
    # CDC pipeline (S/P/A/J rows)
    "cdc_orders_apply",
    "cdc_multi_table_apply",
    # cdc_orders_apply_dms demoted for phase-7: it differs from
    # cdc_orders_apply only in the envelope decoder, which is
    # pytest-matrixed end-to-end (test_envelope, ts-guard DMS cell)
    "cdc_orders_apply_sql",
    # route_insert demoted end-of-r5 for token_entropy: route_delete
    # keeps the P6 predicate family in-window and the insert route runs
    # inside all four CDC flagships
    "route_delete",
    # parse_props_json / delete_where_exists / merge_upsert_customer
    # demoted mid-r5 (window room for the new lm_cross_entropy,
    # corpus_mix_temperature and bloom_novel_docs): P4 runs inside
    # cdc_orders_apply; J1's MERGE and J2's DELETE execute in
    # cdc_orders_apply_sql
    # distinct_fanout_inventory demoted end-of-r5 for
    # snapshot_diff_orders: the same inventory aggregation executes
    # inside the in-window cdc_multi_table_apply flagship
    # snapshot_diff_orders demoted for phase-8 (ivm_orders_by_status):
    # scd2_user_history keeps the changelog full-outer family in-window
    # and the diff is property-tested vs a brute-force model
    "scd2_user_history",
    "dedup_latest_per_key",
    # analytics
    # join_customer_geo demoted end-of-r5 for frequent_part_pairs:
    # shipping_priority keeps the star-join + agg/top-N family in-window
    "frequent_part_pairs",
    # daily_revenue_ma7 demoted late-r5, daily_gapfill_locf demoted for
    # phase-8 (series_correlation_events): cumulative_unique_users +
    # ewma_daily_revenue keep the day-truncated-agg family in-window;
    # LOCF mechanics pinned in tests/test_relational.py + tail oracle
    "series_correlation_events",
    # pivot_segment_region demoted mid-r5 for prepare_training_corpus_v2;
    # family covered by daily_revenue_ma7 + segment_price_percentiles +
    # shipping_priority
    # segment_price_percentiles demoted mid-r5 for data_quality_report;
    # quantile family covered by price_quantile_sketch + the decile gate
    # inside prepare_training_corpus_v2
    "shipping_priority",
    # top_customers_per_segment demoted end-of-r5 for
    # triangle_part_cliques: key_skew_report keeps the ranked top-N
    # window family in-window
    "triangle_part_cliques",
    # text / quality (text_stats demoted mid-r5 for lm_bigram_cross_entropy;
    # family covered by quality_score + token_count_bpe + lang_id_heuristic)
    # lang_id_heuristic demoted late-r5 for dsir_importance_weights:
    # quality_score keeps the heuristic-scoring family in-window and the
    # new entry adds the DSIR data-selection scorer
    # quality_score demoted for phase-7: token_entropy + dsir cover the
    # heuristic-scoring family, components pinned in test_text_gates.py
    # token_entropy demoted for phase-8: dsir_importance_weights +
    # repetition_gates keep heuristic scoring in-window, entropy pinned
    # in pytest
    "dsir_importance_weights",
    # doc_fingerprint demoted mid-r5 for dedup_exact_normalized; its
    # minhash machinery is driven end-to-end by dedup_minhash_lsh
    # token_count_bpe demoted mid-r5 for bpe_learned_tokenize (the
    # learned-tokenizer count supersedes the fixed-regex count)
    "bpe_learned_tokenize",
    # scrub_pii_docs demoted for sparse_cosine_docs: the PII regex
    # machinery is pinned in test_text_gates.py and the normalize/regex
    # surface runs in-window via dedup_exact_normalized
    # contamination_report demoted mid-r5 for funnel_conversion; the
    # shingle-overlap decontamination stage runs inside
    # prepare_training_corpus
    # dedup family (dedup_exact_groups demoted mid-r5 for
    # embedding_pq_codes: the digest groupBy runs inside both in-window
    # composites and incremental_novel_docs)
    "dedup_exact_normalized",
    # dedup_jaccard_prefix demoted for phase-7: the exact-Jaccard verify
    # arithmetic runs inside dedup_minhash_lsh's verify stage, and
    # prefix ≡ all-pairs is property-tested
    # dedup_simhash demoted late-phase-8 for correlated_sample_join:
    # dedup_minhash_lsh keeps the banded near-dup family in-window
    "dedup_minhash_lsh",
    "dedup_substring_windows",
    "dedup_embedding_cosine_lsh",
    # dedup_clusters demoted end-of-r5 for pit_join_views: the identical
    # components + keeper anti-join run inside prepare_training_corpus
    "pit_join_views",
    # dedup_keep_canonical demoted mid-r5 for unpivot_part_metrics; its
    # components + keeper anti-join run inside prepare_training_corpus
    # incremental_novel_docs demoted mid-r5 for cohort_retention;
    # bloom_novel_docs is its in-window approximate scale path
    # similarity (similarity_ann_lsh demoted mid-r5, similarity_ivf
    # demoted for phase-7, similarity_pq_adc + embedding_pq_codes
    # demoted for phase-8: similarity_ivf_pq is the strict superset —
    # same pinned-centroid replay, LUT/ADC/re-rank over residual codes —
    # with recall/parity floors pinned in tests/test_pq.py +
    # tests/test_phase2.py + tests/test_lsh_occupancy.py)
    "similarity_ivf_pq",
    # embedding_centroids demoted mid-r5 for scd2_user_history; its
    # per-component arithmetic family is covered by embedding_quantize
    # and the pinned-centroid IVF/IVF-PQ replays
    "embedding_quantize",
    "standardize_embeddings",
    # multimodal / relational / sampling (multimodal_decode +
    # multimodal_audio_decode demoted late-phase-8: the frame/tile
    # entries drive the same real decoders with finer verification)
    "multimodal_audio_frames",
    "multimodal_image_tiles",
    # multimodal_frame_sample demoted mid-r5 for embedding_quantize; its
    # binary plumbing is covered by the two real-codec entries above
    # sessionize_events demoted end-of-r5, event_transition_matrix +
    # funnel_conversion demoted for phase-8: cohort_retention keeps the
    # per-key ordered-sequence window family in-window; transition
    # counts and funnel ordering stay hand-pinned in pytest
    "cohort_retention",
    # asof_join_orders demoted late-r5, range_join_view_purchase demoted
    # for phase-8 (chisq_lang_source): pit_join_views keeps the
    # temporal-join family in-window; as-of ≡ brute-force and the range
    # join are property-tested

    # unpivot_part_metrics demoted for phase-8: revenue_cube drives the
    # same Expand-plan replication (CUBE lattice) in-window
    "revenue_cube",
    "data_quality_report",
    # pack_sequences demoted end-of-r5 for bm25_search: chunk_documents
    # keeps the token-slicing family in-window and the packer invariants
    # are pinned in tests/test_packing.py
    "bm25_search",
    "chunk_documents",
    # repetition_gates demoted for phase-8 (cusum_change_point):
    # dsir_importance_weights keeps heuristic scoring in-window and the
    # Gopher gates stay pinned in pytest + the tail oracle
    "cusum_change_point",
    # stratified_sample_docs demoted mid-r5 for similarity_ivf_pq; its
    # portable-hash ticket family is covered by corpus_mix_temperature
    # lm_bigram_cross_entropy demoted for phase-8: lm_cross_entropy
    # keeps the quantized-LM machinery in-window, bigram parity pinned
    # in tests/test_lm_quality.py
    "lm_cross_entropy",
    # corpus_mix_temperature + bloom_novel_docs demoted for phase-8:
    # quota_sample_docs covers portable-hash sampling and
    # bloom_join_lineitem_urgent drives the same Bloom machinery
    # in-window; both keep tail oracles + pytest/soak pins
    "quota_sample_docs",
    "trend_by_segment",
    # skew mitigation (skew_salted_agg + skew_salted_join demoted —
    # ≡-plain equalities pinned in test_skew.py; key_skew_report stays)
    "key_skew_report",
    # sketches / composites (cms_user_counts, bloom_novel_docs and
    # price_quantile_sketch all demoted across r5: kmv_join_estimate +
    # the Bloom join keep integer-state sketches in-window; every
    # sketch's state stays cell-replayed in tail oracles + pytest)
    "kmv_join_estimate",
    # tfidf_top_term demoted mid-r5 for dedup_semantic_clusters; its
    # tf/df-aggregation family is covered by the in-window LM entries
    "dedup_semantic_clusters",
    # prepare_training_corpus_v2 demoted for phase-8: each of its stages
    # is independently in-window or runs inside the v1 composite
    "prepare_training_corpus",
    # phase-7 (all NEW this round, in-window by policy)
    "entity_resolution_customers",
    "outlier_mad_events",
    "pagerank_parts",
    "hopping_window_events",
    "sparse_cosine_docs",
    # phase-8 (all NEW this round, in-window by policy)
    "revenue_cube",
    "bfs_part_distances",
    "cumulative_unique_users",
    "ewma_daily_revenue",
    "label_encode_docs",
    "feature_hash_docs",
    "standardize_embeddings",
    "compact_orders_roundtrip",
    "ivm_orders_by_status",
    "chisq_lang_source",
    "multimodal_audio_frames",
    "multimodal_image_tiles",
    "bloom_join_lineitem_urgent",
    "correlated_sample_join",
]

# Operators added or materially changed this round: the rotation policy
# requires them INSIDE the gated window (ADVICE r4).
CHANGED_THIS_ROUND = [
    "dedup_substring_windows",  # reassembly pruned to affected docs (r5)
    "dedup_embedding_cosine_lsh",  # auto-sized planes/tables (r5)
    "chunk_documents",  # new context-window chunking (r5)
    "lm_cross_entropy",  # new unigram-LM quality scoring (r5)
    "embedding_quantize",  # new int8 quantization (r5)
    "dedup_semantic_clusters",  # new SemDeDup cluster-scoped prune (r5)
    "dedup_exact_normalized",  # new RefinedWeb fuzzy-exact dedup (r5)
    "similarity_ivf_pq",  # new IVF-PQ residual-coded ANN (r5)
    "cohort_retention",  # new cohort retention curves (r5)
    "scd2_user_history",  # new SCD Type-2 history materialization (r5)
    "bpe_learned_tokenize",  # new BPE tokenizer induction (r5)
    "data_quality_report",  # new declarative DQ validation (r5)
    "key_skew_report",  # new skew diagnostics (r5)
    "dsir_importance_weights",  # new DSIR importance weighting (r5)
    # snapshot_diff_orders demoted for phase-8 (ivm_orders_by_status):
    # scd2_user_history keeps the changelog full-outer family in-window
    # and the diff is property-tested vs a brute-force model
    "scd2_user_history",  # new snapshot change-data-feed diff (r5)
    "frequent_part_pairs",  # new market-basket frequent pairs (r5)
    "triangle_part_cliques",  # new degree-oriented triangle join (r5)
    "bm25_search",  # new Okapi BM25 keyword retrieval (r5)
    "pit_join_views",  # new point-in-time feature join (r5)
    "entity_resolution_customers",  # new blocked record linkage (r5)
    "outlier_mad_events",  # new median/MAD robust outlier gate (r5)
    "pagerank_parts",  # new fixed-point integer PageRank (r5)
    "hopping_window_events",  # new hopping-window rollup (r5)
    "sparse_cosine_docs",  # new sparse TF-IDF cosine join (r5)
    # mid-r5 entries above that lost their slot to phase 8 moved to
    # queries._DEMOTED with sibling-coverage annotations — the window
    # holds 50 and phase 8's additions are the least-proven
    "revenue_cube",  # new CUBE grouping-set lattice (r5 phase 8)
    "bfs_part_distances",  # new bounded multi-source BFS (r5 phase 8)
    "cumulative_unique_users",  # new growth curve (r5 phase 8)
    "ewma_daily_revenue",  # new exact dyadic EWMA (r5 phase 8)
    "label_encode_docs",  # new categorical encoding (r5 phase 8)
    "feature_hash_docs",  # new hashing-trick features (r5 phase 8)
    "standardize_embeddings",  # new z-score standardization (r5 phase 8)
    "compact_orders_roundtrip",  # new small-file compaction (r5 phase 8)
    "ivm_orders_by_status",  # new incremental view maintenance (r5 phase 8)
    "chisq_lang_source",  # new chi-square contingency audit (r5 phase 8)
    "multimodal_audio_frames",  # new framed audio features (r5 phase 8)
    "multimodal_image_tiles",  # new tile pooling (r5 phase 8)
    "bloom_join_lineitem_urgent",  # new Bloom semi-join reduction (r5 phase 8)
    "correlated_sample_join",  # new join-consistent sampling (r5 phase 8)
    "series_correlation_events",  # new pairwise series correlation (r5 phase 8)
    "cusum_change_point",  # new CUSUM change-point detector (r5 phase 8)
    "trend_by_segment",  # new per-segment OLS trend (r5 phase 8)
    "quota_sample_docs",  # new exact-k quota sampling (r5 phase 8)
    "kmv_join_estimate",  # new KMV join-cardinality estimation (r5 phase 8)
]


def test_gate_window_covers_every_family():
    head = list(q.queries())[:GATE_WINDOW]
    missing = [n for n in REQUIRED_VISIBLE if n not in head]
    assert not missing, f"outside the 50-entry gate window: {missing}"


def test_changed_operators_inside_gate_window():
    head = list(q.queries())[:GATE_WINDOW]
    missing = [n for n in CHANGED_THIS_ROUND if n not in head]
    assert not missing, f"changed operators hidden from the gate: {missing}"
    assert not set(CHANGED_THIS_ROUND) & set(q._DEMOTED)


def test_demoted_entries_still_registered_with_oracles():
    reg = q.queries()
    oracles = q.oracle_sql()
    for name in q._DEMOTED:
        assert name in reg, name
        assert name in oracles, f"{name} lost its oracle when demoted"


def test_every_registered_query_has_an_oracle():
    reg = list(q.queries())
    oracles = q.oracle_sql()
    missing = [n for n in reg if n not in oracles]
    assert not missing, f"oracle-less entries: {missing}"
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
