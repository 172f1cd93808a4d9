"""Language-model quality scoring and temperature-balanced corpus mixing.

Capability additions for the §2.6 training-data-pipeline surface (no
reference citation — these extend the reference's scope):

- :func:`unigram_lm_scores` — CCNet-style quality filtering (Wenzek et al.
  2020): score every document by its cross-entropy under a unigram language
  model *trained on the corpus itself*.  Boilerplate and degenerate text
  (high-frequency-token soup) scores LOW cross-entropy, rare-token noise
  scores HIGH; both tails are what a training pipeline trims.  Public
  pipelines use a 5-gram KenLM here; the unigram variant keeps the exact
  same filtering contract while staying expressible as three built-in
  aggregations, so the whole operator is value-checkable in DuckDB.

- :func:`temperature_mix` — XLM-R-style temperature rebalancing (Conneau
  et al. 2020 §3.1): resample strata (languages, sources) with rate
  ``(n_min / n_stratum) ** (1 - alpha)`` so head strata are down-sampled
  toward the tail without ever up-weighting.  ``alpha=1`` keeps the natural
  distribution, ``alpha=0`` equalizes document counts.  The keep decision
  reuses the deterministic portable-hash ticket of
  :mod:`~cdc_data_lake_pyspark_spark.operators.sampling` — reproducible
  across engines, runs, and partitionings.

Scale (100 TB): :func:`unigram_lm_scores` is two hash aggregations sharing
the ``(id, token)`` partitioning plus one token-keyed join against the
vocabulary (vocabulary rows are bounded by distinct-token count, not corpus
size; AQE broadcasts it when small).  All float math rides the exact
integer bridge — per-token log-probs are quantized to micro-units BEFORE
summation, so per-doc sums are order-independent exact integers and both
engines hash identically.  :func:`temperature_mix` is one tiny per-stratum
count aggregate broadcast back over a map-only filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.functions.text import tokens
from cdc_data_lake_pyspark_spark.operators.relational import portable_id_hash
from cdc_data_lake_pyspark_spark.operators.sampling import RESOLUTION

#: log-probabilities are quantized to millionths of a bit (micro-log2)
#: before aggregation so sums are exact integers in any order/engine.
LOG_MICRO = 1_000_000


def unigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram LM.

    With corpus token counts ``c(tok)`` and total ``T``, every token's
    log2-probability is ``log2 c - log2 T`` (no smoothing needed: scoring
    the training corpus means every token has ``c >= 1``).  Output per
    document:

    - ``n_tokens``  — document length in whitespace tokens;
    - ``sum_logp_micro`` — exact integer ``sum round(1e6*log2 c) -
      n*round(1e6*log2 T)`` (total micro-log2-prob, <= 0);
    - ``cross_entropy`` — bits/token, ``-sum_logp_micro / (1e6 * n)``.

    Perplexity is ``2 ** cross_entropy``; it is left to the caller because
    ``exp2`` is the one step whose last-ulp behavior libms may disagree on,
    while everything up to ``cross_entropy`` is bit-identical across
    engines (integer sums + one IEEE division).

    Plan shape: explode → ``(id, tok)`` count → vocabulary count (map-side
    combined, keyed on ``tok``) → join doc-term rows to the vocabulary →
    per-doc sum.  The join carries ``(id, tok, m)`` rows — bounded by
    distinct terms per doc, not token occurrences — and AQE broadcasts the
    vocabulary side when it is small.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    doc_term = toks.groupBy(id_col, "_tok").agg(
        F.count(F.lit(1)).alias("_m")
    )
    vocab = doc_term.groupBy("_tok").agg(F.sum("_m").alias("_c"))
    totals = vocab.agg(
        F.sum("_c").alias("_T"),
        F.round(F.log2(F.sum("_c")) * LOG_MICRO, 0)
        .cast("long")
        .alias("_lt"),
    )
    scored = (
        doc_term.join(
            vocab.select(
                "_tok",
                F.round(F.log2("_c") * LOG_MICRO, 0).cast("long").alias("_lc"),
            ),
            "_tok",
        )
        .groupBy(id_col)
        .agg(
            F.sum("_m").alias("n_tokens"),
            F.sum(F.col("_m") * F.col("_lc")).alias("_sum_lc"),
        )
        .crossJoin(F.broadcast(totals.select("_lt")))
    )
    return scored.select(
        id_col,
        "n_tokens",
        (F.col("_sum_lc") - F.col("n_tokens") * F.col("_lt")).alias(
            "sum_logp_micro"
        ),
        (
            (
                F.col("n_tokens") * F.col("_lt") - F.col("_sum_lc")
            ).cast("double")
            / (F.col("n_tokens").cast("double") * F.lit(float(LOG_MICRO)))
        ).alias("cross_entropy"),
    )


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.3,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic temperature-rebalanced resampling across strata.

    Keep rate per stratum is ``(n_min / n_stratum) ** (1 - alpha)``: the
    smallest stratum keeps everything, larger strata are down-sampled
    toward it; ``alpha`` in [0, 1] interpolates natural → uniform.  Rates
    are quantized to an integer millionth threshold, and a row is kept iff
    ``portable_hash(stratum|id) % 1e6 < threshold`` — the same auditable
    ticket as :func:`~.sampling.stratified_sample`, so the selected set is
    a pure function of the data.

    Returns the kept rows as ``(id, stratum, threshold)``; ``threshold``
    is the stratum's keep rate in millionths (exposed so the selection is
    self-describing and hash-checkable).

    Scale: one #strata-row count aggregate, broadcast joined back; the
    filter itself is map-only.  The ``pow`` feeding the threshold is one
    double op on exact integer inputs, rounded to an integer — last-ulp
    libm divergence cannot move the threshold except exactly on a .5
    micro-boundary (measure-zero; same contract as the LSH oracles).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    counts = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_n_min"))
    thresholds = counts.crossJoin(F.broadcast(n_min)).select(
        strata_col,
        F.round(
            F.pow(
                F.col("_n_min").cast("double") / F.col("_n").cast("double"),
                F.lit(1.0 - alpha),
            )
            * RESOLUTION,
            0,
        )
        .cast("long")
        .alias("threshold"),
    )
    ticket = F.pmod(
        portable_id_hash(F.concat_ws("|", F.col(strata_col), F.col(id_col))),
        F.lit(RESOLUTION),
    )
    return (
        docs.select(id_col, strata_col)
        .join(F.broadcast(thresholds), strata_col)
        .filter(ticket < F.col("threshold"))
        .select(id_col, strata_col, "threshold")
    )


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained add-one bigram
    LM — one step closer to the 5-gram KenLM CCNet actually ships, with
    the same exact-integer portability contract as
    :func:`unigram_lm_scores`.

    With bigram occurrence counts ``c2(a b)``, prefix counts
    ``c1(a) = sum_b c2(a b)`` and vocabulary size ``V`` (distinct tokens
    anywhere in the corpus), each bigram occurrence scores
    ``log2(c2 + 1) - log2(c1 + V)`` (add-one smoothing).  Documents with
    fewer than two tokens carry no bigram and are excluded.  Output per
    document: ``n_bigrams``, exact-integer ``sum_logp_micro``, and
    ``cross_entropy`` in bits/bigram.

    Plan shape: one bigram explode → ``(doc, bigram)`` count, reduced to
    a bigram vocabulary and (by one more combine on the prefix) a prefix
    vocabulary; the doc-term rows then join both vocabularies —
    bigram-keyed and prefix-keyed, each bounded by distinct-n-gram count,
    broadcast by AQE when small — and one final per-doc sum.  Log-probs
    quantize to micro-bits per DISTINCT vocabulary entry before the
    weighted sums, so per-doc totals are order-independent integers.
    """
    w = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col), w.alias("_w"), F.size(w).alias("_n")
    ).filter(F.col("_n") >= 2)
    bg = base.select(
        id_col,
        F.explode(F.sequence(F.lit(1), F.col("_n") - 1)).alias("_i"),
        "_w",
    ).select(
        id_col,
        F.element_at("_w", F.col("_i")).alias("_a"),
        F.array_join(F.slice("_w", F.col("_i"), 2), " ").alias("_g"),
    )
    doc_bg = bg.groupBy(id_col, "_a", "_g").agg(F.count(F.lit(1)).alias("_m"))
    bg_vocab = doc_bg.groupBy("_a", "_g").agg(F.sum("_m").alias("_c2"))
    prefix_vocab = bg_vocab.groupBy("_a").agg(F.sum("_c2").alias("_c1"))
    vocab_size = docs.select(
        F.explode(tokens(F.col(text_col))).alias("_tok")
    ).agg(F.countDistinct("_tok").alias("_V"))
    l2 = bg_vocab.select(
        "_g",
        F.round(F.log2(F.col("_c2") + 1) * LOG_MICRO, 0)
        .cast("long")
        .alias("_l2"),
    )
    l1 = (
        prefix_vocab.crossJoin(F.broadcast(vocab_size))
        .select(
            "_a",
            F.round(F.log2(F.col("_c1") + F.col("_V")) * LOG_MICRO, 0)
            .cast("long")
            .alias("_l1"),
        )
    )
    scored = (
        doc_bg.join(l2, "_g")
        .join(l1, "_a")
        .groupBy(id_col)
        .agg(
            F.sum("_m").alias("n_bigrams"),
            F.sum(F.col("_m") * (F.col("_l2") - F.col("_l1"))).alias(
                "sum_logp_micro"
            ),
        )
    )
    return scored.select(
        id_col,
        "n_bigrams",
        "sum_logp_micro",
        (
            (-F.col("sum_logp_micro")).cast("double")
            / (F.col("n_bigrams").cast("double") * F.lit(float(LOG_MICRO)))
        ).alias("cross_entropy"),
    )


def importance_weights(
    docs: DataFrame,
    is_target,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights for targeted data selection (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by the log-likelihood ratio of a
    target-domain unigram LM over the raw-corpus unigram LM,

        weight(d) = sum_w  m_d(w) * [ log p_target(w) - log p_raw(w) ]

    with add-one smoothing over the shared raw vocabulary (size ``V``) so
    tokens unseen in the target stay finite.  Sampling ``w > threshold``
    (or Gumbel top-k on the weights) shifts the corpus toward the target
    domain; ``is_target`` is any boolean Column marking the in-domain
    exemplar docs (a trusted high-quality slice).

    Exact-integer portability contract as :func:`unigram_lm_scores`:
    every per-token log2 term quantizes to micro-bits BEFORE the weighted
    sums, so ``logratio_micro`` is an order-independent integer and the
    DuckDB oracle reproduces it bit-for-bit.  ``avg_logratio`` is
    bits/token (one IEEE division).

    Plan shape: one explode pass builds ``(doc, tok, m)``; the raw
    vocabulary is one more combine, the target vocabulary a filtered
    aggregation of the SAME doc-term rows (no second scan of the text);
    doc-terms join the merged per-token log table (AQE-broadcast when the
    vocabulary is small) and reduce per doc.  Everything is keyed on the
    token — bounded by vocabulary size, not corpus size.
    """
    toks = docs.select(
        F.col(id_col),
        is_target.alias("_tgt"),
        F.explode(tokens(F.col(text_col))).alias("_tok"),
    )
    doc_term = toks.groupBy(id_col, "_tok").agg(
        F.count(F.lit(1)).alias("_m"),
        F.max("_tgt").alias("_is_tgt"),
    )
    vocab = doc_term.groupBy("_tok").agg(
        F.sum("_m").alias("_cr"),
        F.sum(F.when(F.col("_is_tgt"), F.col("_m")).otherwise(0)).alias(
            "_ct"
        ),
    )
    totals = vocab.agg(
        F.sum("_cr").alias("_Tr"),
        F.sum("_ct").alias("_Tt"),
        F.count(F.lit(1)).alias("_V"),
    ).select(
        F.round(F.log2(F.col("_Tr") + F.col("_V")) * LOG_MICRO, 0)
        .cast("long")
        .alias("_ltr"),
        F.round(F.log2(F.col("_Tt") + F.col("_V")) * LOG_MICRO, 0)
        .cast("long")
        .alias("_ltt"),
    )
    logs = vocab.select(
        "_tok",
        F.round(F.log2(F.col("_cr") + 1) * LOG_MICRO, 0)
        .cast("long")
        .alias("_lcr"),
        F.round(F.log2(F.col("_ct") + 1) * LOG_MICRO, 0)
        .cast("long")
        .alias("_lct"),
    )
    scored = (
        doc_term.join(logs, "_tok")
        .groupBy(id_col)
        .agg(
            F.sum("_m").alias("n_tokens"),
            F.sum(F.col("_m") * (F.col("_lct") - F.col("_lcr"))).alias(
                "_sum_num"
            ),
        )
        .crossJoin(F.broadcast(totals))
    )
    return scored.select(
        id_col,
        "n_tokens",
        (
            F.col("_sum_num")
            - F.col("n_tokens") * (F.col("_ltt") - F.col("_ltr"))
        ).alias("logratio_micro"),
        (
            (
                F.col("_sum_num")
                - F.col("n_tokens") * (F.col("_ltt") - F.col("_ltr"))
            ).cast("double")
            / (F.col("n_tokens").cast("double") * F.lit(float(LOG_MICRO)))
        ).alias("avg_logratio"),
    )


def token_entropy_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy of the within-document unigram
    distribution — the word-diversity gate: templated / repetitive
    documents (one token dominating) score near 0 bits, fully diverse
    documents score ``log2 n_tokens``.  A standard low-cost companion to
    the corpus-LM cross-entropy gates for pretraining-corpus filtering.

    With per-doc token counts ``m(w)`` and total ``n``:

        H = log2 n - (1/n) * sum_w m(w) * log2 m(w)

    Exact-integer portability contract as :func:`unigram_lm_scores`:
    ``entropy_micro = n*L(n) - sum_w m(w)*L(m(w))`` with
    ``L(x) = round(1e6 * log2 x)`` is an order-independent integer
    (``entropy = entropy_micro / (1e6 * n)`` bits/token, one IEEE
    division), so the DuckDB oracle matches bit-for-bit.

    Plan shape: explode → (doc, token) count → one per-doc reduce.  All
    state is per-document; no corpus-wide join at all, so this is the
    cheapest of the LM-family gates — one shuffle on the doc id that the
    downstream gate aggregation shares.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    dt = toks.groupBy(id_col, "_tok").agg(F.count(F.lit(1)).alias("_m"))
    per = dt.groupBy(id_col).agg(
        F.sum("_m").alias("n_tokens"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.sum(
            F.col("_m")
            * F.round(F.log2("_m") * LOG_MICRO, 0).cast("long")
        ).alias("_sum_mlm"),
    )
    ent_micro = (
        F.col("n_tokens")
        * F.round(F.log2("n_tokens") * LOG_MICRO, 0).cast("long")
        - F.col("_sum_mlm")
    )
    return per.select(
        id_col,
        "n_tokens",
        "distinct_tokens",
        ent_micro.alias("entropy_micro"),
        (
            ent_micro.cast("double")
            / (F.col("n_tokens").cast("double") * F.lit(float(LOG_MICRO)))
        ).alias("entropy"),
    )


def bm25_top_k(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 relevance ranking: the top-``k`` documents for a bag of query
    terms under Okapi BM25 — the textual counterpart of the embedding
    top-k family (similarity.py), for keyword retrieval over a corpus.

        score(d) = sum_t idf(t) * tf_t,d*(k1+1) / (tf_t,d + k1*(1-b+b*|d|/avgdl))
        idf(t)   = log2((N - df_t + 0.5) / (df_t + 0.5))

    Cross-engine exactness: ``idf`` quantizes to micro-bits (the
    LOG_MICRO bridge) BEFORE entering the score product, and each
    (doc, term) partial score rounds to an integer micro-score before
    the per-doc sum — so totals are order-independent integers and the
    DuckDB oracle reproduces the ranking bit-for-bit.  The remaining
    float steps (the tf saturation ratio) are single IEEE expressions
    over exact integers + one shared ``avgdl`` division, identical in
    any engine.  Ties break on ascending id.

    Plan shape: TWO corpus passes total — document lengths come from a
    map-only ``size(tokens(...))`` projection (no explode), staged once
    behind an eager local checkpoint so the corpus-stats aggregate and the
    score join both read the per-doc rows instead of rescanning; the
    (doc, term) counts come from one explode pass whose query-term
    filter prunes to |Q| terms immediately.  df/idf is a |Q|-row
    aggregate (broadcast), and the final top-k is a rank-window over
    per-doc sums.
    """
    q = [t.lower() for t in query_terms]
    doc_len = docs.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("_dl")
    ).localCheckpoint(eager=True)
    stats = doc_len.agg(
        F.count(F.lit(1)).alias("_N"), F.avg("_dl").alias("_avgdl")
    )
    dt = (
        docs.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
        )
        .filter(F.col("_tok").isin(q))
        .groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    idf = (
        dt.groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "_tok",
            "_N",
            "_avgdl",
            F.round(
                F.log2(
                    (F.col("_N") - F.col("_df") + 0.5)
                    / (F.col("_df") + 0.5)
                )
                * LOG_MICRO,
                0,
            )
            .cast("long")
            .alias("_idf_micro"),
        )
    )
    scored = (
        dt.join(F.broadcast(idf), "_tok")
        .join(doc_len, id_col)
        .select(
            id_col,
            F.round(
                F.col("_idf_micro")
                * (
                    (F.col("_tf") * (k1 + 1.0))
                    / (
                        F.col("_tf")
                        + k1
                        * (
                            1.0
                            - b
                            + b * (F.col("_dl") / F.col("_avgdl"))
                        )
                    )
                ),
                0,
            )
            .cast("long")
            .alias("_s"),
        )
        .groupBy(id_col)
        .agg(F.sum("_s").alias("score_micro"))
    )
    # Top-k via ranked_topk → TakeOrderedAndProject: each partition keeps
    # a k-row heap and the driver merges, so the corpus-sized scored frame
    # never lands on one partition (a bare row_number() window with no
    # PARTITION BY would).  Deterministic tiebreak on id preserved.
    from .relational import ranked_topk

    return (
        ranked_topk(
            scored, [F.col("score_micro").desc(), F.col(id_col).asc()], k
        )
        .select(
            id_col,
            "rank",
            "score_micro",
            (F.col("score_micro").cast("double") / F.lit(float(LOG_MICRO))).alias(
                "score"
            ),
        )
    )
