"""The driver's correctness gate samples the first 50 registry entries;
pin that the gated window covers every operator family and that the
rotation policy holds (queries.py `_DEMOTED` rationale): new/changed
operators sit inside the window, and previously demoted entries rotate
back in so the driver re-verifies them round over round.

Round-6 window: the 22 tail entries the driver had NEVER sampled
(VERDICT r5 next-round #1) rotated in alongside the three NEW r6
entries; 25 entries driver-verified green in CORRECTNESS_r05.json
rotated out, each with a family sibling left in-window (rationales in
queries._DEMOTED)."""

from cdc_data_lake_pyspark_spark import queries as q

GATE_WINDOW = 50

# One representative per operator family that MUST sit inside the gate.
REQUIRED_VISIBLE = [
    # CDC pipeline flagships (S/P/A/J rows execute inside these)
    "cdc_orders_apply",
    "cdc_multi_table_apply",
    "cdc_orders_apply_sql",  # executed-SQL MERGE/DELETE via LocalLake
    # dedup family (dedup_minhash_lsh rotated out mid-r6 for its NEW
    # star-capped sibling, which runs the same pipeline plus the cap)
    "dedup_minhash_star_clusters",
    "dedup_substring_windows",
    # the r6 rotation batch: never driver-sampled before this round
    "bloom_novel_docs",
    "corpus_mix_temperature",
    "daily_gapfill_locf",
    "daily_revenue_ma7",
    "embedding_normalize",
    "embedding_pq_codes",
    "event_transition_matrix",
    "funnel_conversion",
    "lm_bigram_cross_entropy",
    "multimodal_audio_decode",
    "multimodal_decode",
    "prepare_training_corpus_v2",
    "price_quantile_sketch",
    "range_join_view_purchase",
    "repetition_gates",
    "returned_item_customers",
    "similarity_pq_adc",
    "skew_salted_agg",
    "skew_salted_join",
    "snapshot_diff_orders",
    "token_entropy",
    "unpivot_part_metrics",
    # analytics / TPC-H
    "shipping_priority",
    "series_correlation_events",
    "triangle_part_cliques",
    # composites
    "prepare_training_corpus",
    # text / tokenizer / retrieval
    "bpe_learned_tokenize",
    "bm25_search",
    "chunk_documents",
    # linkage / quality / skew diagnostics
    "entity_resolution_customers",
    "outlier_mad_events",
    "data_quality_report",
    "key_skew_report",
    # graph
    "pagerank_parts",
    "bfs_part_distances",
    # streaming-window rollups
    "hopping_window_events",
    # sparse similarity
    "sparse_cosine_docs",
    # features / encodings
    "label_encode_docs",
    # IVM / layout / stats
    "ivm_orders_by_status",
    "compact_orders_roundtrip",
    "chisq_lang_source",
]

# Operators added or materially changed this round: the rotation policy
# requires them INSIDE the gated window (ADVICE r4).
CHANGED_THIS_ROUND = [
    "html_extract_main",  # NEW r6: HTML main-content extraction
    "novelty_gate_batch",  # NEW r6: novelty gate's batch core oracled
    "semantic_gate_batch",  # NEW r6: semantic gate's batch core oracled
    "prepare_web_corpus",  # NEW r6: raw-web extract->gate->dedup->split
    "bm25_search",  # r6: top-k via TakeOrderedAndProject (plan fix)
    "key_skew_report",  # r6: same top-N plan fix
    "bfs_part_distances",  # r6: explicit seed col + node semi-join
    "compact_orders_roundtrip",  # r6: sizing fallback for unstat-able files
    "prepare_training_corpus_v2",  # r6: approx sketch-threshold gate mode
    "dedup_minhash_star_clusters",  # NEW r6: hot-family star-capped LSH
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


def test_required_lists_have_no_duplicates():
    assert len(REQUIRED_VISIBLE) == len(set(REQUIRED_VISIBLE))
    assert len(CHANGED_THIS_ROUND) == len(set(CHANGED_THIS_ROUND))
    assert len(q._DEMOTED) == len(set(q._DEMOTED))


def test_window_is_exactly_the_non_demoted_head():
    reg = list(q.queries())
    head, tail = reg[:GATE_WINDOW], reg[GATE_WINDOW:]
    assert not set(head) & set(q._DEMOTED)
    assert set(tail) <= set(q._DEMOTED)


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
