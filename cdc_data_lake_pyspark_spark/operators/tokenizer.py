"""BPE tokenizer induction (Sennrich et al. 2016): learn merge rules
from the corpus, apply them distributively.

Training-data pipelines don't just COUNT tokens — they learn the
tokenizer (vocabulary induction) from the corpus itself.  The split
here follows the repo's bounded-driver-fit contract (the IVF/PQ
pattern):

* :func:`learn_bpe_merges` — pure-Python byte-pair-merge learning on a
  bounded, id-ordered sample of documents (word-frequency weighted,
  deterministic tie-break), so the learned merge list is a pure
  function of the data and an oracle can re-learn it offline and pin
  the merges as SQL literals.
* :func:`apply_bpe_merges` — a COLUMN expression (no UDF): each word is
  char-spaced (``regexp_replace('(.)', '$1 ')``) and the merge list is
  applied as a chain of literal ``replace('a b' → 'ab')`` calls inside
  a higher-order ``transform`` over the word array.  Left-to-right
  non-overlapping replace is the standard apply-merges algorithm, and
  Spark's ``replace`` and DuckDB's ``replace`` share those semantics
  exactly — so both engines tokenize bit-identically, entirely
  JVM-side, zero shuffle.

Scale: learning is one bounded TakeOrdered + a driver loop (milliseconds
for the merge counts that matter); application is map-only whole-stage
codegen over the corpus.  At 100 TB the sample contract is the same one
FAISS uses for quantizer training — merge quality saturates long before
the corpus does.
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_fit_rows: int = 200_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a bounded id-ordered
    sample (whitespace words of the lower-cased text, frequency
    weighted).  Ties on pair count break on the lexicographically
    smallest pair, so the merge list is fully deterministic."""
    pdf = (
        docs.select(id_col, F.lower(F.col(text_col)).alias("_t"))
        .orderBy(id_col)
        .limit(max_fit_rows)
        .toPandas()
    )
    return learn_bpe_merges_from_texts(pdf["_t"].tolist(), n_merges)


def learn_bpe_merges_from_texts(
    texts: Sequence[str], n_merges: int
) -> list[tuple[str, str]]:
    """Pure-Python core of :func:`learn_bpe_merges` — shared verbatim by
    the oracle generator so the offline re-learn pins the identical
    merge list."""
    word_freq = Counter()
    for t in texts:
        if t:
            for w in t.lower().split(" "):
                if w:
                    word_freq[w] += 1
    # each word as a tuple of current symbols
    vocab = {tuple(w): c for w, c in word_freq.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def apply_bpe_merges(
    word: Column, merges: Sequence[tuple[str, str]]
) -> Column:
    """Tokenize one word column with a learned merge list: char-space,
    then the replace chain in merge order.  Returns the space-joined
    token string (``size(split(·, ' '))`` counts tokens).  Pure column
    expression — whole-stage codegen, no UDF, no shuffle."""
    out = F.trim(F.regexp_replace(word, "(.)", "$1 "))
    for a, b in merges:
        out = F.replace(out, F.lit(f"{a} {b}"), F.lit(a + b))
    return out


def bpe_token_counts(
    docs: DataFrame,
    merges: Sequence[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token count under the LEARNED tokenizer:
    ``(id, n_words, n_tokens)``.  The merge chain runs inside a
    higher-order ``transform`` over the word array — one map-only
    projection over the corpus."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda w: w != ""
    )
    tokenized = F.transform(words, lambda w: apply_bpe_merges(w, merges))
    return docs.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(
            tokenized,
            F.lit(0).cast("long"),
            lambda acc, tw: acc + F.size(F.split(tw, " ")),
        ).alias("n_tokens"),
    )
