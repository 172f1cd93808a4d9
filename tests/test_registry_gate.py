"""The driver's correctness gate samples the first 50 registry entries;
pin that the gated window covers every operator family (queries.py
`_DEMOTED` rationale)."""

from cdc_data_lake_pyspark_spark import queries as q

GATE_WINDOW = 50

# One representative per operator family that MUST sit inside the gate.
REQUIRED_VISIBLE = [
    # CDC pipeline (S/P/A/J rows)
    "cdc_orders_apply",
    "cdc_multi_table_apply",
    "cdc_orders_apply_dms",
    "cdc_orders_apply_sql",
    "route_upsert",
    "parse_props_json",
    "timestamp_roundtrip",
    "distinct_fanout_inventory",
    "dedup_composite_key",
    "merge_upsert_customer",
    "delete_where_exists",
    # analytics
    "agg_pricing_summary",
    "orders_revenue_by_nation",
    "revenue_rollup",
    "pivot_segment_region",
    "segment_price_percentiles",
    "shipping_priority",
    "purchase_attribution_window",
    # text / quality
    "text_stats",
    "lang_id_heuristic",
    "quality_score",
    "doc_fingerprint",
    "token_count_bpe",
    "scrub_pii_docs",
    "doc_repetition_ratio",
    "contamination_report",
    # dedup family
    "dedup_exact_groups",
    "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_lsh",
    "dedup_clusters",
    "dedup_keep_canonical",
    "incremental_novel_docs",
    # similarity
    "similarity_topk_bruteforce",
    "similarity_ivf",
    "similarity_ann_lsh",
    "embedding_centroids",
    # multimodal / relational / sampling
    "multimodal_extract",
    "multimodal_frame_sample",
    "sessionize_events",
    "asof_join_orders",
    "split_assignment",
    "pack_sequences",
    "stratified_sample_docs",
    # sketches / composites
    "hll_distinct_users",
    "cms_user_counts",
    "tfidf_top_term",
    "prepare_training_corpus",
]


def test_gate_window_covers_every_family():
    head = list(q.queries())[:GATE_WINDOW]
    missing = [n for n in REQUIRED_VISIBLE if n not in head]
    assert not missing, f"outside the 50-entry gate window: {missing}"


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
