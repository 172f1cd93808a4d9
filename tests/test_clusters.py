"""Connected components + canonical dedup (operators/clusters.py)."""

import pytest
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.clusters import (
    connected_components,
    dedup_keep_canonical,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a_id long, b_id long")


def _cc_dict(df):
    return {r["node"]: r["cluster_id"] for r in df.collect()}


def test_chain_collapses_to_one_cluster(spark):
    # 1-2-3-4-5-6-7-8: worst case for plain propagation (diameter 7);
    # pointer jumping must still converge well inside the bound.
    chain = _pairs(spark, [(i, i + 1) for i in range(1, 8)])
    got = _cc_dict(connected_components(chain))
    assert got == {i: 1 for i in range(1, 9)}


def test_two_cliques_and_isolated_pair(spark):
    pairs = _pairs(
        spark,
        [(10, 11), (11, 12), (10, 12),  # triangle
         (20, 21), (21, 22),            # path
         (30, 31)],                      # lone pair
    )
    got = _cc_dict(connected_components(pairs))
    assert got == {
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_layout_independent(spark):
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 20)] + [(50, 60)])
    a = _cc_dict(connected_components(pairs))
    b = _cc_dict(connected_components(pairs.repartition(7, "b_id")))
    assert a == b


def test_non_convergence_raises(spark):
    chain = _pairs(spark, [(i, i + 1) for i in range(1, 12)])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iterations=1)


def test_dedup_keep_canonical_drops_non_minimum_members(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(2, 3), (3, 4), (6, 7)])
    kept = sorted(
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect()
    )
    # clusters {2,3,4} -> keep 2; {6,7} -> keep 6; 1 and 5 untouched
    assert kept == [1, 2, 5, 6]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

pairs_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=1,
    max_size=60,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then label = min member per root
    roots = {}
    for n in list(parent):
        roots.setdefault(find(n), []).append(n)
    return {n: min(members) for root, members in roots.items() for n in members}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=pairs_strategy)
def test_random_graphs_match_union_find(spark, pairs):
    got = _cc_dict(connected_components(_pairs(spark, pairs)))
    assert got == _union_find(pairs)
