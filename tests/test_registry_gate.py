"""The driver's correctness gate samples the first 50 registry entries;
pin that the gated window covers every operator family and that the
rotation policy holds (queries.py `_DEMOTED` rationale): new/changed
operators sit inside the window, and previously demoted entries rotate
back in so the driver re-verifies them round over round.

Round-10 window: the r10 diffs made the prefix-join prunes float-safe
(ε guards on plen / length / positional), swapped the cluster/keeper
pair source to the prefix join, literal-quoted the paragraph separator
and anchored the URL query regex — those entries stay in-window;
prepare_web_corpus_v2 (URL dedup as stage 0) is NEW; and
returned_item_customers / cohort_retention / chisq_lang_source
(driver-green r8) rotate back IN.  similarity_topk_bruteforce,
dedup_minhash_lsh, bm25_search and outlier_mad_events take their tail
slots, each with a family sibling left in-window (rationales in
queries._DEMOTED)."""

from cdc_data_lake_pyspark_spark import queries as q

GATE_WINDOW = 50

# One representative per operator family that MUST sit inside the gate.
REQUIRED_VISIBLE = [
    # CDC pipeline flagships (S/P/A/J rows execute inside these)
    "cdc_orders_apply",
    "cdc_multi_table_apply",
    "cdc_orders_apply_sql",  # executed-SQL MERGE/DELETE via LocalLake
    # dedup family (dedup_minhash_lsh demoted r10: the star/cv cluster
    # entries drive the same signature/banding/verify machinery harder)
    "dedup_latest_per_key",
    "dedup_minhash_cv_clusters",
    "dedup_embedding_cosine_lsh",
    "dedup_semantic_clusters",
    "dedup_exact_normalized",
    "dedup_substring_windows",
    # similarity / PQ family (r6-changed code re-signed per ADVICE r6)
    "similarity_ivf",
    "similarity_ivf_pq",
    "similarity_pq_adc",
    "embedding_pq_codes",
    # dedup exact-verify family (plain + prefix both in-window for r9 —
    # both rewritten this round and they share the IDENTICAL oracle)
    "dedup_jaccard_prefix",
    # composites
    "prepare_training_corpus",
    "prepare_training_corpus_lsh",  # NEW r8: LSH-mode flagship composite
    "prepare_training_corpus_v2",
    # (prepare_web_corpus v1 demoted mid-r10: v3 runs its whole tail
    # verbatim behind the host gate + URL keeper)
    "prepare_web_corpus_v2",  # NEW r10: URL dedup as stage 0
    "prepare_web_corpus_v3",  # NEW r10: full pipeline, host gate first
    # LM / text scoring (bm25_search demoted r10: token_entropy +
    # bpe_learned_tokenize and the v2 composite's CE/DSIR machinery
    # stay in-window)
    "token_entropy",
    "bpe_learned_tokenize",
    "chunk_documents",
    "html_extract_main",
    # sampling / mixing / epoch ordering
    "corpus_mix_temperature",
    "training_order_shards",  # NEW r10: deterministic epoch shuffle
    # changelog / ordered sequences (scd2_user_history demoted mid-r9
    # for the new URL-dedup entry; diff shape pinned in pytest + tail)
    "event_transition_matrix",
    # analytics / TPC-H shapes (triangle_part_cliques demoted mid-r9
    # for the new paragraph-dedup entry; graph family keeps pagerank+bfs)
    "revenue_cube",
    "series_correlation_events",
    # temporal / time-bucketed
    "range_join_view_purchase",
    "daily_gapfill_locf",
    # linkage / quality / skew diagnostics (outlier_mad_events demoted
    # r10; chisq_lang_source rotates back in alongside key_skew_report)
    "entity_resolution_customers",
    "chisq_lang_source",
    "key_skew_report",
    # graph (pagerank_parts demoted mid-r10 for the training-order
    # entry; schedule stays tail-oracled + bit-exact in pytest)
    "bfs_part_distances",
    # sparse similarity / features
    "sparse_cosine_docs",
    "label_encode_docs",
    # IVM / layout
    "ivm_orders_by_status",
    "compact_orders_roundtrip",
    # multimodal codecs
    "multimodal_decode",
    # streaming gates (novelty_gate_batch demoted mid-r10 for the new
    # host-filter entry; soak-tested + Bloom family in-window)
    "semantic_gate_batch",
    # host-level URL-quality gating (NEW r10)
    "host_filter_docs",
    # web-pipeline URL stage (NEW r9)
    "url_dedup_canonical",
    # corpus-wide paragraph dedup (NEW r9)
    "dedup_paragraphs_global",
    # r9-changed paths the driver re-signed in CORRECTNESS_r09 — kept
    # in-window because r10 touched them again (see CHANGED_THIS_ROUND)
    # (dedup_minhash_star_clusters demoted mid-r10: cv runs the same
    # star-capped machinery plus repair, incremental probe is new)
    "dedup_jaccard_pairs",
    "dedup_keep_canonical",
    "dedup_clusters",
    "contamination_report",
    # NEW mid-r10: incremental near-dup probe against a prebuilt index
    "dedup_incremental_minhash",
    # r10 rotate-backs (driver-green r8, tail-oracled since)
    "returned_item_customers",
    "cohort_retention",
]

# Operators added or materially changed this round: the rotation policy
# requires them INSIDE the gated window (ADVICE r4).
CHANGED_THIS_ROUND = [
    # r10: float-safe ε guards on the prefix path's plen / length /
    # positional prunes (ADVICE r9)
    "dedup_jaccard_prefix",
    # r10: pair source swapped to the prefix-filtered exact join
    # (VERDICT r9 #1)
    "dedup_clusters",
    "dedup_keep_canonical",
    # r10: flagship composite consumes the changed prefix path
    "prepare_training_corpus",
    # r10: separator literal-quoted before F.split (ADVICE r9)
    "dedup_paragraphs_global",
    # r10: anchored pre-fragment query regex + parameterized
    # tracking-param list (ADVICE r9 / VERDICT r9 #4)
    "url_dedup_canonical",
    # NEW r10: web capstone with URL dedup as stage 0 (VERDICT r9 #6)
    "prepare_web_corpus_v2",
    # NEW mid-r10: host-level quality gating (RefinedWeb-style URL
    # filtering — per-host dup-rate aggregate + blocklist gate)
    "host_filter_docs",
    # NEW mid-r10: deterministic epoch ordering (seeded-shuffle
    # (shard, pos) assignment, replayed exactly by the oracle)
    "training_order_shards",
    # NEW mid-r10: the complete web pipeline in canonical order (host
    # gate -> URL dedup -> extract -> content dedup -> split)
    "prepare_web_corpus_v3",
    # NEW mid-r10: incremental near-dup — probe a new batch against a
    # prebuilt MinHash index (signatures + buckets), exact-verified
    "dedup_incremental_minhash",
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
