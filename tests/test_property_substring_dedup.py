"""Property-based checks for exact-substring window dedup against a pure
single-machine reduction model (same semantics, computed with plain Python
dicts): keeper election by (doc_id, start), span removal, reassembly."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_data_lake_pyspark_spark.operators.dedup_text import (
    substring_window_dedup,
)

K = 3
VOCAB = ["a", "b", "c", "d"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=10).map(" ".join),
    min_size=1,
    max_size=6,
)


def _model(texts):
    """Pure-Python reduction: identical semantics to the operator."""
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    occurrences = {}
    for i, tk in toks.items():
        for s in range(len(tk) - K + 1):
            occurrences.setdefault(tuple(tk[s : s + K]), []).append((i, s))
    dropped = {}
    for occ in occurrences.values():
        if len(occ) > 1:
            for i, s in sorted(occ)[1:]:
                dropped.setdefault(i, set()).update(range(s, s + K))
    out = {}
    for i, tk in toks.items():
        keep = [t for p, t in enumerate(tk) if p not in dropped.get(i, set())]
        out[i] = (" ".join(keep), len(tk), len(tk) - len(keep))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_substring_dedup_matches_reduction_model(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_dropped)
        for r in substring_window_dedup(docs, k=K).collect()
    }
    assert got == _model(texts)
