"""Property tests for the non-SQL-oracle phase-2 operators: the hash-based
paths are validated against their exact counterparts."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.dedup_text import (
    exact_dedup,
    jaccard_similar_pairs,
    minhash_near_duplicates,
    simhash_signatures,
)
from cdc_data_lake_pyspark_spark.operators.multimodal import (
    decode_image,
    extract_features,
    fake_decode_features,
    sample_frames,
    text_as_binary,
    with_media_metadata,
)
from cdc_data_lake_pyspark_spark.operators.similarity import (
    brute_force_top_k,
    hyperplane_lsh_top_k,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    """LSH + exact verification: precision 1.0 (subset of exact pairs) and
    high recall at the 0.8 threshold."""
    docs = _docs(spark, sf_dir)
    exact = {
        (r.a_id, r.b_id) for r in jaccard_similar_pairs(docs, threshold=0.8).collect()
    }
    approx = {
        (r.a_id, r.b_id)
        for r in minhash_near_duplicates(docs, threshold=0.8).collect()
    }
    assert approx <= exact  # exact verification ⇒ no false positives
    assert exact, "fixture should contain planted near-duplicates"
    recall = len(approx) / len(exact)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_star_cap_preserves_clusters(spark, sf_dir):
    """Size-capped banding (star edges in over-cap buckets) emits a
    SUBSET of the exact pair set, yet connected components over the two
    edge sets agree — the contract dedup_minhash_star_clusters' oracle
    relies on."""
    from cdc_data_lake_pyspark_spark.operators.clusters import (
        connected_components,
    )

    docs = _docs(spark, sf_dir)
    exact = minhash_near_duplicates(docs, threshold=0.8)
    star = minhash_near_duplicates(docs, threshold=0.8, star_bucket_cap=2)
    ep = {(r.a_id, r.b_id) for r in exact.select("a_id", "b_id").collect()}
    sp = {(r.a_id, r.b_id) for r in star.select("a_id", "b_id").collect()}
    assert sp <= ep
    ec = {tuple(r) for r in connected_components(exact.select("a_id", "b_id")).collect()}
    sc = {tuple(r) for r in connected_components(star.select("a_id", "b_id")).collect()}
    assert sc == ec


def test_star_cap_bounds_hot_family_candidates(spark):
    """A 40-member duplicate family: uncapped banding verifies every
    within-bucket pair (O(n²) candidates — the salted-families pathology
    in SCALE.md §8), the cap bounds candidates to n−1 star edges while
    the family still collapses to ONE cluster."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        _exploded_shingles,
        _signatures_from_ex,
        _stage,
        lsh_candidate_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [Row(doc_id=i, text=base) for i in range(40)]
    docs = spark.createDataFrame(rows)
    ex = _stage(_exploded_shingles(docs, "doc_id", "text", 3))
    sigs = _signatures_from_ex(ex, 64).cache()
    full = lsh_candidate_pairs(sigs).count()
    capped = lsh_candidate_pairs(sigs, star_bucket_cap=8).count()
    assert full == 40 * 39 // 2, "family is all-pairs quadratic uncapped"
    assert capped == 39, "cap bounds candidates to n-1 star edges"

    from cdc_data_lake_pyspark_spark.operators.clusters import (
        connected_components,
    )

    star = minhash_near_duplicates(docs, threshold=0.5, star_bucket_cap=8)
    comp = connected_components(star.select("a_id", "b_id"))
    n_clusters = comp.select("cluster_id").distinct().count()
    n_members = comp.count()
    assert n_members == 40 and n_clusters == 1


def test_prefix_filtering_is_exact(spark, sf_dir):
    """Prefix filtering must lose NO pairs: identical output (ids and
    jaccard values) to the unfiltered shingle self-join."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        jaccard_similar_pairs_prefix,
    )

    docs = _docs(spark, sf_dir)
    for t in (0.8, 0.5):
        plain = {
            (r.a_id, r.b_id): r.jaccard
            for r in jaccard_similar_pairs(docs, threshold=t).collect()
        }
        pref = {
            (r.a_id, r.b_id): r.jaccard
            for r in jaccard_similar_pairs_prefix(docs, threshold=t).collect()
        }
        assert pref == plain


def test_prefix_doc_arrays_canonical_order(spark, sf_dir):
    """r9: the per-doc array intermediate is sorted by (document
    frequency asc, hash asc) — the canonical order whose first
    ``n − ⌈t·n⌉ + 1`` elements ARE the SSJoin prefix — and carries each
    doc's full distinct-shingle hash set (it doubles as the verification
    set)."""
    from pyspark.sql import functions as F

    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        _exploded_hashes,
        _prefix_doc_arrays,
    )

    docs = _docs(spark, sf_dir).limit(200)
    exh = _exploded_hashes(docs, "doc_id", "text", 3)
    per_doc = {r._id: r._hs for r in _prefix_doc_arrays(exh).collect()}
    df_counts = {}
    sets = {}
    for r in exh.collect():
        df_counts[r._h] = df_counts.get(r._h, 0) + 1
        sets.setdefault(r._id, set()).add(r._h)
    assert set(per_doc) == set(sets)
    for doc_id, hs in per_doc.items():
        assert set(hs) == sets[doc_id]  # full set, usable for verify
        keys = [(df_counts[h], h) for h in hs]
        assert keys == sorted(keys)  # canonical (df asc, hash asc)


def test_prefix_plan_has_no_corpus_wide_sort(spark, sf_dir):
    """r9 plan-shape pin: the prefix path's executed plan must contain no
    Sort over the corpus-wide exploded set — ordering happens per-doc
    inside ``array_sort``.  The only Sorts Catalyst may plan statically
    are the tiny candidate-id semi-join's SortMergeJoin inputs (AQE
    broadcasts them at runtime); a corpus Sort would mean the window
    formulation regressed back in."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        jaccard_similar_pairs_prefix,
    )

    docs = _docs(spark, sf_dir)
    df = jaccard_similar_pairs_prefix(docs, threshold=0.8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "+- Sort " in line or line.strip().startswith("Sort "):
            assert "_id#" in line, f"non-semi-join Sort in prefix plan: {line}"
        if "Window" in line:
            raise AssertionError(f"window op back in prefix plan: {line}")


def test_simhash_near_dups_are_hamming_close(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    pairs = jaccard_similar_pairs(docs, threshold=0.9).limit(5).collect()
    assert pairs
    sig = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    import random

    all_ids = sorted(sig)
    rnd = random.Random(7)
    near = [bin(sig[p.a_id] ^ sig[p.b_id]).count("1") for p in pairs]
    far = [
        bin(sig[rnd.choice(all_ids)] ^ sig[rnd.choice(all_ids)]).count("1")
        for _ in range(50)
    ]
    assert max(near) < 16, f"near-dup hamming too high: {near}"
    assert sum(far) / len(far) > max(near), "signatures don't separate near vs random"


def test_exact_dedup_finds_planted_dups(spark):
    rows = [
        Row(doc_id=1, text="hello world"),
        Row(doc_id=2, text="Hello World "),  # same after normalize
        Row(doc_id=3, text="different"),
    ]
    out = exact_dedup(spark.createDataFrame(rows)).collect()
    groups = {r.keeper_id: r.n_docs for r in out}
    assert groups == {1: 2, 3: 1}


def test_ann_lsh_recall(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_top_k(emb, queries, k=3, exclude_self=True)
    approx = hyperplane_lsh_top_k(
        emb, queries, k=3, dim=64, n_planes=5, n_tables=8, exclude_self=True
    )
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # hyperplane LSH trades recall for candidate reduction; embeddings are
    # near-uniform random here (hardest case for ANN), so the bar is modest
    assert recall >= 0.4, f"ANN recall suspiciously low: {recall}"
    # every returned neighbor must be scored identically to the exact op
    joined = approx.alias("a").join(
        exact.alias("e"),
        (F.col("a.query_id") == F.col("e.query_id"))
        & (F.col("a.neighbor_id") == F.col("e.neighbor_id")),
    )
    mismatch = joined.filter(F.col("a.score") != F.col("e.score")).count()
    assert mismatch == 0


def test_ivf_recall(spark, sf_dir):
    """IVF must beat the ANN recall floor and return exact-scored rows."""
    from cdc_data_lake_pyspark_spark.operators.similarity import ivf_top_k

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_top_k(emb, queries, k=3, exclude_self=True)
    approx = ivf_top_k(emb, queries, k=3, n_clusters=16, n_probe=6, exclude_self=True)
    exact_rows = {(r.query_id, r.neighbor_id): r.score for r in exact.collect()}
    approx_rows = {(r.query_id, r.neighbor_id): r.score for r in approx.collect()}
    recall = len(exact_rows.keys() & approx_rows.keys()) / len(exact_rows)
    assert recall >= 0.5, f"IVF recall suspiciously low: {recall}"
    for pair in exact_rows.keys() & approx_rows.keys():
        assert exact_rows[pair] == approx_rows[pair]  # same strict-fold score


def test_cosine_pairs_blocking_is_exact(spark, sf_dir):
    """The distributed block self-join must produce the SAME pair set and
    bit-identical scores regardless of block count (1 block ≡ the single
    in-memory matmul)."""
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    emb = _emb(spark, sf_dir)
    base = {
        (r.a_id, r.b_id): r.score
        for r in cosine_near_dup_pairs(emb, threshold=0.4, n_blocks=1).collect()
    }
    assert base, "fixture should contain near-duplicate embeddings"
    for n_blocks in (3, 8):
        got = {
            (r.a_id, r.b_id): r.score
            for r in cosine_near_dup_pairs(
                emb, threshold=0.4, n_blocks=n_blocks
            ).collect()
        }
        assert got == base


def test_cosine_lsh_pairs_subset_and_recall(spark, sf_dir):
    """Banded pairs must be a subset of the exact pairs with identical
    scores (precision 1), at reasonable recall."""
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        cosine_near_dup_pairs,
        cosine_near_dup_pairs_lsh,
    )

    emb = _emb(spark, sf_dir)
    exact = {
        (r.a_id, r.b_id): r.score
        for r in cosine_near_dup_pairs(emb, threshold=0.4).collect()
    }
    approx = {
        (r.a_id, r.b_id): r.score
        for r in cosine_near_dup_pairs_lsh(emb, threshold=0.4, dim=64).collect()
    }
    assert set(approx) <= set(exact)
    for pair, score in approx.items():
        assert score == exact[pair]  # exact rescore ⇒ identical bits
    recall = len(approx) / len(exact)
    assert recall >= 0.6, f"LSH pair recall suspiciously low: {recall}"


def test_multimodal_metadata_jvm_side(spark):
    rows = [Row(doc_id=1, text="abc"), Row(doc_id=2, text="")]
    df = with_media_metadata(text_as_binary(spark.createDataFrame(rows)), "payload")
    meta = {r.doc_id: r.payload_meta for r in df.collect()}
    assert meta[1].n_bytes == 3
    assert meta[1].digest == "900150983cd24fb0d6963f7d28e17f72"  # md5('abc')


def test_extract_features_deterministic(spark):
    rows = [Row(doc_id=i, text=f"doc number {i}") for i in range(10)]
    df = text_as_binary(spark.createDataFrame(rows)).repartition(4)
    out = {r.doc_id: r for r in extract_features(df, dim=8).collect()}
    assert len(out) == 10
    expected = fake_decode_features(b"doc number 3", dim=8)
    assert out[3].features == expected
    assert out[3].n_bytes == len(b"doc number 3")


def test_decode_image_dispatch():
    # unrecognized containers raise; injected decoders take precedence
    with pytest.raises(ValueError):
        decode_image(b"bytes")
    assert decode_image(b"bytes", decoder=lambda b: [1.0]) == [1.0]
    # the real pure-numpy BMP path round-trips (full coverage in
    # tests/test_codecs.py, including hand-written golden bytes)
    import numpy as np

    from cdc_data_lake_pyspark_spark.functions.codecs import encode_bmp

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_image(encode_bmp(px)) == px).all()


def test_sample_frames_offsets(spark):
    rows = [Row(doc_id=1, text="x" * 200)]
    df = text_as_binary(spark.createDataFrame(rows))
    frames = sample_frames(df, every_n_bytes=64).collect()
    assert [r.frame_offset for r in frames] == [1, 65, 129, 193]
    assert bytes(frames[0].frame_bytes) == b"x" * 64
    assert bytes(frames[-1].frame_bytes) == b"x" * 8  # tail frame is short


def test_suggest_lsh_planes_pins_bucket_occupancy():
    from cdc_data_lake_pyspark_spark.operators.similarity import suggest_lsh_planes

    # occupancy N / 2^planes stays within [target/2, 2*target] as N grows
    for n in (1_000, 100_000, 10_000_000, 1_000_000_000):
        p = suggest_lsh_planes(n, target_bucket_rows=64)
        occupancy = n / (2**p)
        assert occupancy <= 64, (n, p, occupancy)
        assert occupancy > 16 or n < 2_000, (n, p, occupancy)
    # monotone in N, floored at 4
    assert suggest_lsh_planes(10) == 4
    planes = [suggest_lsh_planes(n) for n in (10**3, 10**5, 10**7, 10**9)]
    assert planes == sorted(planes)


def test_int8_quantization_roundtrip_and_zero_vectors(spark):
    import math

    from cdc_data_lake_pyspark_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    rows = [
        (0, [1.0, -2.0, 0.5]),
        (1, [0.0, 0.0, 0.0]),
        (2, [127.0, -127.0, 63.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = quantize_embeddings_int8(df).collect()
    got = {(r["vec_id"], r["dim"]): (r["q"], r["scale"]) for r in out}
    # codes bounded, max-abs component hits ±127 exactly
    assert all(-127 <= q <= 127 for q, _ in got.values())
    assert got[(0, 1)][0] == -127
    assert got[(2, 0)][0] == 127
    # zero vector → zero codes, zero scale (no NaNs)
    assert [got[(1, d)][0] for d in range(3)] == [0, 0, 0]
    assert got[(1, 0)][1] == 0.0
    # dequantization error bounded by scale/2 per component
    for (vid, dim), (q, scale) in got.items():
        x = rows[vid][1][dim]
        assert math.isfinite(scale)
        assert abs(q * scale - x) <= scale / 2 + 1e-12


def test_semantic_dedup_subset_and_invariance(spark):
    """SemDeDup (semantic_dedup): every dropped id must have a smaller-id
    neighbor at >= threshold in the EXACT all-pairs set (within-cell
    pruning can only find a subset of exact pairs — precision 1), the
    verdicts must be partition-invariant, and at least one planted
    near-duplicate must actually be dropped on the driver corpus."""
    import os

    import pytest

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        cosine_near_dup_pairs,
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    out = semantic_dedup(emb, threshold=0.4, n_clusters=16)
    rows = {r["vec_id"]: (r["cell"], r["kept"]) for r in out.collect()}
    assert len(rows) == emb.count()
    dropped = {i for i, (_, kept) in rows.items() if not kept}
    assert dropped, "no planted near-duplicate was pruned"
    exact_higher = {
        r["b_id"]
        for r in cosine_near_dup_pairs(emb, threshold=0.4).collect()
    }
    assert dropped <= exact_higher
    rows2 = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in semantic_dedup(
            emb.repartition(11), threshold=0.4, n_clusters=16
        ).collect()
    }
    assert rows == rows2


def test_default_star_cap_is_noop_on_non_hot_corpus(spark, sf_dir):
    """r7: the default star_bucket_cap ("auto" → DEFAULT_STAR_BUCKET_CAP)
    must be a NO-OP on healthy corpora — identical pair set AND jaccard
    values to the unconditional all-pairs (star_bucket_cap=None) run on
    the documents table, whose LSH collision groups sit far below the
    cap.  This is the parity contract that lets the cap default on in
    every composite without touching their oracles."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        DEFAULT_STAR_BUCKET_CAP,
    )

    assert DEFAULT_STAR_BUCKET_CAP >= 32
    docs = _docs(spark, sf_dir)
    capped = {
        (r.a_id, r.b_id, round(r.jaccard, 12))
        for r in minhash_near_duplicates(docs, threshold=0.8).collect()
    }
    uncapped = {
        (r.a_id, r.b_id, round(r.jaccard, 12))
        for r in minhash_near_duplicates(
            docs, threshold=0.8, star_bucket_cap=None
        ).collect()
    }
    assert capped == uncapped


def _chain_docs(spark, n=14, w=21, step=2):
    """Sliding-window chain: doc i = w tokens starting at step*i, so
    3-shingle Jaccard is (w-2-step)/(w-2+step) ≈ 0.81 for neighbors and
    < 0.66 at distance 2 — a near-threshold chain."""
    words = [f"w{j:04d}" for j in range(step * n + w + 10)]
    rows = [
        Row(doc_id=i, text=" ".join(words[step * i : step * i + w]))
        for i in range(n)
    ] + [
        Row(
            doc_id=100 + i,
            text=" ".join(f"z{i}x{j}" for j in range(30)),
        )
        for i in range(3)
    ]
    return spark.createDataFrame(rows)


def test_cv_recovers_chain_the_star_cap_splits(spark):
    """r7 cluster-then-verify contract: on a near-threshold chain whose
    every mid-chain bucket is hot (single-row bands over sliding
    windows), the star-capped pair path PROVABLY splits the chain —
    members only clear the threshold against chain neighbors, never the
    per-bucket representative — while minhash_near_dup_clusters_cv's
    boundary-pair repair recovers exactly the exact-Jaccard clusters."""
    from cdc_data_lake_pyspark_spark.operators.clusters import (
        connected_components,
    )
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        minhash_near_dup_clusters_cv,
    )

    docs = _chain_docs(spark)
    kw = dict(threshold=0.8, num_hashes=16, bands=16, rows_per_band=1)
    exact = {
        tuple(r)
        for r in connected_components(
            jaccard_similar_pairs(docs, threshold=0.8).select("a_id", "b_id")
        ).collect()
    }
    star = {
        tuple(r)
        for r in connected_components(
            minhash_near_duplicates(docs, star_bucket_cap=2, **kw).select(
                "a_id", "b_id"
            )
        ).collect()
    }
    cv = {
        tuple(r)
        for r in minhash_near_dup_clusters_cv(
            docs, star_bucket_cap=2, **kw
        ).collect()
    }
    assert len({c for _, c in exact}) == 1, "fixture: one exact chain cluster"
    assert star != exact, "fixture must make the star cap split the chain"
    assert len({c for _, c in star}) >= 2
    assert cv == exact


def test_cv_matches_exact_clusters_on_corpus(spark, sf_dir):
    """cv with a forced tiny cap equals the exact-Jaccard connected
    components on the real documents corpus — the contract behind the
    dedup_minhash_cv_clusters oracle."""
    from cdc_data_lake_pyspark_spark.operators.clusters import (
        connected_components,
    )
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        minhash_near_dup_clusters_cv,
    )

    docs = _docs(spark, sf_dir)
    exact = {
        tuple(r)
        for r in connected_components(
            jaccard_similar_pairs(docs, threshold=0.8).select("a_id", "b_id")
        ).collect()
    }
    cv = {
        tuple(r)
        for r in minhash_near_dup_clusters_cv(
            docs, threshold=0.8, star_bucket_cap=2
        ).collect()
    }
    assert cv == exact


def test_paragraph_dedup_global_semantics(spark):
    """Hand-pinned CCNet paragraph-dedup case: the shared banner vanishes
    from every doc, per-doc unique lines survive in order, a paragraph
    shared by exactly two docs is dropped from both, and a doc made of
    nothing but boilerplate disappears entirely."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        paragraph_dedup_global,
    )

    rows = [
        (1, "BANNER\nalpha one\nshared pair\nfooter 1"),
        (2, "BANNER\nbeta two\nshared pair\nfooter 2"),
        (3, "BANNER\ngamma three\nfooter 3"),
        (4, "BANNER"),  # pure boilerplate: should vanish
        # same paragraph twice in ONE doc: df counts distinct docs, so a
        # doc-internal repeat does NOT make it corpus-duplicated
        (5, "delta five\ndelta five\nfooter 5"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.text
        for r in paragraph_dedup_global(docs, max_df=1).collect()
    }
    assert got == {
        1: "alpha one\nfooter 1",
        2: "beta two\nfooter 2",
        3: "gamma three\nfooter 3",
        5: "delta five\ndelta five\nfooter 5",
    }
    # max_df=2 keeps the two-doc shared paragraph but still kills the
    # four-doc banner
    got2 = {
        r.doc_id: r.text
        for r in paragraph_dedup_global(docs, max_df=2).collect()
    }
    assert got2[1] == "alpha one\nshared pair\nfooter 1"
    assert got2[2] == "beta two\nshared pair\nfooter 2"
    assert 4 not in got2


def test_prefix_ppjoin_filters_exact_on_hot_families(spark):
    """r9: the PPJoin length + positional filters must lose no true pair
    on the regime that stresses them — duplicate families whose members
    share most shingles (near-threshold Jaccard) at VARYING lengths
    (length filter active) with family-specific rare salts (positional
    filter sees shared tokens at differing prefix depths)."""
    from pyspark.sql import Row

    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        jaccard_similar_pairs,
        jaccard_similar_pairs_prefix,
    )

    rows = []
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    for fam in range(4):
        for m in range(8):
            # per-member tail of growing length: members differ in size,
            # so some cross-member pairs fail the length filter and the
            # rest sit near the threshold
            tail = " ".join(f"salt{fam} extra{fam} tok{j}" for j in range(m))
            rows.append(
                Row(doc_id=fam * 100 + m, text=(base + " " + tail).strip())
            )
    docs = spark.createDataFrame(rows)
    for t in (0.8, 0.5):
        plain = {
            (r.a_id, r.b_id): round(r.jaccard, 9)
            for r in jaccard_similar_pairs(docs, threshold=t).collect()
        }
        pref = {
            (r.a_id, r.b_id): round(r.jaccard, 9)
            for r in jaccard_similar_pairs_prefix(docs, threshold=t).collect()
        }
        assert pref == plain, (t, len(pref), len(plain))
        assert plain, "fixture should produce pairs at this threshold"


def test_prefix_float_safe_at_exact_threshold_boundary(spark):
    """ADVICE r9: a pair sitting EXACTLY at threshold must survive the
    prefix path when the float ratio rounds against it.  t = 0.57:
    fl(t/(1+t)) > 57/157 and fl(100·t) > 57, so the r9 ceil-based
    positional bound (58 > overlap_ub 57), the un-slacked length filter
    (fl(100·t) ≤ 57 false) and the un-slacked prefix length
    (100 − ⌈fl(100·t)⌉ + 1 = 43, one short) EACH dropped the pair the
    plain join keeps.  doc 1's 57 trigram shingles are a prefix-subset
    of doc 2's 100, J = fl(57/100) = fl(0.57) ≥ t in double semantics —
    all three ε sites must hold for the pair to come back."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        jaccard_similar_pairs_prefix,
    )

    words = [f"w{i:03d}" for i in range(102)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(words[:59])),  # 57 distinct trigrams
            (2, " ".join(words)),  # 100 distinct trigrams, superset
        ],
        ["doc_id", "text"],
    )
    t = 0.57
    plain = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in jaccard_similar_pairs(docs, threshold=t).collect()
    }
    assert plain == {(1, 2): 0.57}, plain
    pref = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in jaccard_similar_pairs_prefix(docs, threshold=t).collect()
    }
    assert pref == plain


def test_prefix_exactness_at_awkward_thresholds(spark):
    """Prefix ≡ plain across thresholds whose float ratios round badly
    (0.57, 0.6, 0.66, 0.9) on the varying-length hot-family corpus —
    the property sweep behind the ε guards."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        jaccard_similar_pairs_prefix,
    )

    rows = []
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    for fam in range(3):
        for m in range(7):
            tail = " ".join(f"salt{fam} extra{fam} tok{j}" for j in range(m))
            rows.append(
                Row(doc_id=fam * 100 + m, text=(base + " " + tail).strip())
            )
    docs = spark.createDataFrame(rows)
    for t in (0.57, 0.6, 0.66, 0.9):
        plain = {
            (r.a_id, r.b_id): round(r.jaccard, 9)
            for r in jaccard_similar_pairs(docs, threshold=t).collect()
        }
        pref = {
            (r.a_id, r.b_id): round(r.jaccard, 9)
            for r in jaccard_similar_pairs_prefix(docs, threshold=t).collect()
        }
        assert pref == plain, (t, len(pref), len(plain))


def test_paragraph_dedup_metachar_separator(spark):
    """ADVICE r9: ``sep`` is a LITERAL — a regex-metacharacter separator
    ('.', '||') must split on the separator string, not on every
    character / the empty regex."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        paragraph_dedup_global,
    )

    docs = spark.createDataFrame(
        [(1, "alpha one.BANNER.omega one"), (2, "beta two.BANNER.omega two")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.text
        for r in paragraph_dedup_global(docs, max_df=1, sep=".").collect()
    }
    assert got == {1: "alpha one.omega one", 2: "beta two.omega two"}

    docs2 = spark.createDataFrame(
        [(1, "left part||SHARED||right one"), (2, "mid part||SHARED||right two")],
        ["doc_id", "text"],
    )
    got2 = {
        r.doc_id: r.text
        for r in paragraph_dedup_global(docs2, max_df=1, sep="||").collect()
    }
    assert got2 == {1: "left part||right one", 2: "mid part||right two"}


def test_prefix_float_safe_at_default_threshold(spark):
    """The same rounding class at the DEFAULT threshold: fl(0.8) > 4/5,
    so fl(0.8·5) = 4.000000000000001 and the unslacked prefix length for
    a 5-shingle doc came out ONE SHORT (⌈4.0…1⌉ = 5 → plen 1 instead of
    2), silently able to miss a 4⊂5 subset pair at J = fl(4/5) = fl(0.8)
    ≥ t.  Pin the pair end-to-end: doc 1's 4 trigrams ⊂ doc 2's 5."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        jaccard_similar_pairs_prefix,
    )

    words = [f"v{i}" for i in range(7)]
    docs = spark.createDataFrame(
        [(1, " ".join(words[:6])), (2, " ".join(words))],
        ["doc_id", "text"],
    )
    plain = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in jaccard_similar_pairs(docs, threshold=0.8).collect()
    }
    assert plain == {(1, 2): 0.8}, plain
    pref = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in jaccard_similar_pairs_prefix(docs, threshold=0.8).collect()
    }
    assert pref == plain


def test_minhash_probe_estimate_and_verify(spark, sf_dir):
    """Incremental probe: (a) verify mode equals the exhaustive
    cross-split exact-Jaccard answer; (b) estimate mode touches no
    corpus text and its Broder estimates sit within the 64-hash
    binomial band of the true Jaccard for every verified pair."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        minhash_index,
        minhash_probe,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    index = minhash_index(corpus)

    exact_pairs = {
        (r.a_id, r.b_id): r.jaccard
        for r in jaccard_similar_pairs(docs, threshold=0.8).collect()
        if (r.a_id % 3 == 0) != (r.b_id % 3 == 0)
    }
    cross = {
        (a, b) if a % 3 == 0 else (b, a): j
        for (a, b), j in exact_pairs.items()
    }
    verified = {
        (r.batch_id, r.index_id): r.jaccard
        for r in minhash_probe(
            batch, index, threshold=0.8, verify_docs=docs
        ).collect()
    }
    assert verified == cross and verified, (len(verified), len(cross))

    # estimate mode: gate below target (estimator noise), then check
    # every true pair is found with an estimate near its exact value
    est = {
        (r.batch_id, r.index_id): r.jaccard
        for r in minhash_probe(batch, index, threshold=0.6).collect()
    }
    for pair, true_j in cross.items():
        assert pair in est, pair
        # 64 hashes: sd ~ 0.05 at J~0.8; 5 sd band
        assert abs(est[pair] - true_j) <= 0.25, (pair, est[pair], true_j)


def test_prefix_exactness_property_sweep(spark):
    """VERDICT r10 #6: the ε-guards' WHOLE claim — prefix-join output ==
    plain-join output — swept over randomized corpora × randomized
    thresholds, not just the pinned 0.57/0.8 cases.  100 seeded random
    corpora (base sequence + random delete/substitute/truncate edits, so
    pairwise Jaccards land all over (0,1)) are unioned with seed-salted
    tokens (no cross-corpus shingle can collide), then ONE plain and ONE
    prefix run per threshold covers every corpus at once — 100 × 9
    (corpus, threshold) combinations, exact equality required on pair
    sets AND jaccard values."""
    import random

    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        jaccard_similar_pairs_prefix,
    )

    rows = []
    for seed in range(100):
        rng = random.Random(seed)
        n = rng.randint(15, 30)
        base = [f"s{seed}t{j}" for j in range(n)]
        for i in range(rng.randint(4, 8)):
            toks = list(base)
            for _ in range(rng.randint(0, 3)):
                op = rng.choice(("del", "sub", "trunc"))
                if op == "del" and len(toks) > 6:
                    toks.pop(rng.randrange(len(toks)))
                elif op == "sub":
                    toks[rng.randrange(len(toks))] = f"s{seed}x{rng.randrange(40)}"
                elif len(toks) > 8:
                    toks = toks[: rng.randrange(8, len(toks) + 1)]
            rows.append(Row(doc_id=seed * 1000 + i, text=" ".join(toks)))
    docs = spark.createDataFrame(rows).repartition(8).localCheckpoint()

    rng = random.Random(4242)
    thresholds = [round(rng.uniform(0.05, 0.95), 6) for _ in range(6)]
    thresholds += [0.5, 2 / 3, 0.9999]  # exact-ratio + boundary spice
    for t in thresholds:
        plain = {
            (r.a_id, r.b_id): round(r.jaccard, 9)
            for r in jaccard_similar_pairs(docs, threshold=t).collect()
        }
        pref = {
            (r.a_id, r.b_id): round(r.jaccard, 9)
            for r in jaccard_similar_pairs_prefix(docs, threshold=t).collect()
        }
        assert pref == plain, (
            t,
            len(pref),
            len(plain),
            set(plain) ^ set(pref),
        )
