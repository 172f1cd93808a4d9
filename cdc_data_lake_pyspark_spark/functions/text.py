"""Text-analysis operators for large-scale training-data pipelines.

Capability additions mandated by BASELINE.json §2.6 (no reference citation —
these extend the reference's surface): language-ID (stopword-hit heuristic),
quality scoring, token counting, and document fingerprinting, all over the
``documents`` table.

Everything here is a *Column builder* over built-in ``pyspark.sql.functions``
— JVM-side, whole-stage-codegen'd, zero Python in the hot path, and every
expression has a 1:1 ANSI-SQL equivalent so the DuckDB oracle can replicate
it exactly.  At 100 TB these are embarrassingly parallel map-only
projections: no shuffle, pushdown-friendly (only ``text`` is read).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the heuristic language scorer.
#: Deliberately small and fixed so the DuckDB oracle can inline them.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "von", "zu", "ist"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
    "es": ("el", "los", "las", "y", "en", "que", "es"),
}

#: Deterministic tie-break order for argmax over language scores.
LANG_ORDER = ("en", "de", "fr", "es")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lower-cased)."""
    return F.split(F.lower(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


#: BPE-ish pre-tokenizer: letter runs, digit runs, or single punctuation —
#: the GPT-2-style split shape, portable to any regex engine.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(text: Column) -> Column:
    """Regex pre-tokenization (letters / digits / punctuation runs) — the
    'BPE-ish' token count basis; JVM regexp, no UDF."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def normalize_text(text: Column) -> Column:
    """RefinedWeb/FineWeb-style aggressive normalization for fuzzy-exact
    dedup (Penedo et al. 2023): lowercase, collapse every run of
    non-alphanumeric characters to a single space, trim — so documents
    differing only in case, punctuation, or whitespace share one
    fingerprint.  Character-class-only regex (Java ≡ RE2), map-only."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))


#: Rolling-hash parameters: base 257, modulus 2^31 − 1 (Mersenne prime).
#: acc stays < 2^31, so acc*257 + codepoint never overflows int64 — the
#: arithmetic is exact and portable across engines.
ROLLING_BASE = 257
ROLLING_MOD = 2_147_483_647


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash of the whole document (Karp–Rabin shape):
    ``h = Σ code(c_i)·B^i  (mod M)`` via a strict left fold over the
    codepoint array.  Exact integer arithmetic ⇒ bit-identical in any
    engine with 64-bit ints."""
    codes = F.transform(
        F.split(text, ""), lambda ch: F.ascii(ch).cast("long")
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + c) % ROLLING_MOD,
    )


def char_stats(text: Column) -> dict[str, Column]:
    """Character-class ratios used by quality scoring.

    All ratios are double divisions in a fixed expression order so both
    engines produce bit-identical values.
    """
    n = F.length(text)
    spaces = n - F.length(F.regexp_replace(text, " ", ""))
    digits = n - F.length(F.regexp_replace(text, "[0-9]", ""))
    alpha = n - F.length(F.regexp_replace(text, "[A-Za-z]", ""))
    nd = n.cast("double")
    return {
        "n_chars": n.cast("bigint"),
        "space_ratio": spaces.cast("double") / nd,
        "digit_ratio": digits.cast("double") / nd,
        "alpha_ratio": alpha.cast("double") / nd,
    }


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles — the unit for Jaccard/MinHash dedup.

    Built from k−1 ``zip_with`` passes over shifted copies of the token
    array (each a whole-array operation), NOT a per-position
    ``transform(slice(...))`` — higher-order expressions are interpreted,
    so O(k) array passes beat O(n) per-position slices ~3× at k=3.
    Tail entries where the shifted arrays run short concat to NULL and are
    cut by the final length slice.
    """
    toks = tokens(text)
    n = F.size(toks)
    grams = toks
    for j in range(2, k + 1):
        shifted = F.slice(toks, j, F.greatest(n - (j - 1), F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(F.slice(grams, 1, F.greatest(n - (k - 1), F.lit(0))))


def doc_fingerprint(text: Column, k: int = 3) -> Column:
    """Document fingerprint: lexicographic MIN of the md5 of each k-shingle
    (a 1-hash MinHash / winnowing-style signature).  md5-hex strings are
    portable across engines, so the oracle can reproduce it exactly.

    NOTE: per-element md5 inside ``transform`` is interpreted; for bulk
    fingerprinting prefer :func:`~cdc_data_lake_pyspark_spark.operators.
    dedup_text.doc_fingerprints` (explode + codegen'd MIN aggregate)."""
    hashed = F.transform(shingles(text, k), lambda s: F.md5(s))
    return F.array_min(hashed)


def language_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit count per language over the token list."""
    toks = tokens(text)
    out = {}
    for lang in LANG_ORDER:
        words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(words, t)))
    return out


def language_id(text: Column) -> Column:
    """Argmax language with fixed tie-break order (en > de > fr > es);
    'und' (undetermined) when no stopword hits at all."""
    scores = language_scores(text)
    cols = [scores[lang] for lang in LANG_ORDER]
    best = F.greatest(*cols)
    expr = F.lit("und")
    # build CASE from last to first so earlier languages win ties
    result = F.when(best == 0, F.lit("und"))
    for lang in LANG_ORDER:
        result = result.when(scores[lang] == best, F.lit(lang))
    return result.otherwise(expr)


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1]: rewards moderate length and
    alphabetic content, penalizes digit soup.  Fixed expression order for
    cross-engine bit parity."""
    stats = char_stats(text)
    tok = token_count(text).cast("double")
    length_term = F.least(tok / F.lit(64.0), F.lit(1.0))
    return (
        F.lit(0.5) * length_term
        + F.lit(0.4) * stats["alpha_ratio"]
        + F.lit(0.1) * (F.lit(1.0) - stats["digit_ratio"])
    )


#: PII patterns kept to plain character classes so Java regex (Spark) and
#: RE2 (DuckDB) agree exactly — no lookarounds, no shorthand classes.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"


def scrub_pii(text: Column) -> Column:
    """Redact emails then phone numbers with typed placeholders — the
    PII-scrubbing pass of a training pipeline.  Map-only JVM regex; at
    100 TB this is a free rider on any other full-text pass."""
    redacted = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(redacted, PHONE_PATTERN, "<PHONE>")


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class (detection/reporting mode)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_PATTERN)),
        "n_phones": F.regexp_count(text, F.lit(PHONE_PATTERN)),
    }
