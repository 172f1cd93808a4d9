"""Property-based semantics for the phase-8 operators: random inputs
must match pure-Python reference models (the test_property_cdc.py
contract — the oracle gate pins engine parity on the driver tables;
these pin SEMANTICS on adversarial shapes: cycles, self-loops,
disconnected seeds, delete-everything deltas, all-tied frequencies)."""

from collections import deque

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from cdc_data_lake_pyspark_spark.operators.features import label_encode
from cdc_data_lake_pyspark_spark.operators.graph import bfs_distances
from cdc_data_lake_pyspark_spark.operators.ivm import (
    aggregate_state,
    apply_agg_delta,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# directed edges over a small node universe: dense enough for cycles,
# self-loops, and multi-path shapes
_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=1,
    max_size=20,
)
_seeds = st.sets(st.integers(min_value=0, max_value=7), min_size=1, max_size=3)


def _bfs_model(edges, seeds, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    # r6 contract (ADVICE r5): seeds are restricted to the graph's node
    # inventory, so operator and oracle agree on out-of-graph seeds
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    seeds = [s for s in seeds if s in nodes]
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        n = q.popleft()
        if dist[n] >= max_hops:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return dist


@given(edges=_edges, seeds=_seeds, hops=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_bfs_equals_textbook_model(spark, edges, seeds, hops):
    e = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    sdf = spark.createDataFrame([Row(node=n) for n in seeds])
    got = {
        r.node: r.dist
        for r in bfs_distances(e, sdf, max_hops=hops).collect()
    }
    assert got == _bfs_model(edges, seeds, hops)


# IVM: a base multiset and a VALID op sequence (inserts of anything,
# deletes only of rows currently live) must equal the recompute
_base = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), max_size=12
)
_ops = st.lists(
    st.tuples(st.booleans(), st.integers(0, 3), st.integers(0, 50)),
    max_size=12,
)


@given(base=_base, ops=_ops)
@settings(**_SETTINGS)
def test_ivm_equals_recompute_under_valid_op_sequences(spark, base, ops):
    live = list(base)
    delta = []
    for is_insert, g, v in ops:
        if is_insert:
            live.append((g, v))
            delta.append((g, float(v), 1))
        elif live:  # delete an existing row (first match by generated key)
            tgt = live[(g * 7 + v) % len(live)]
            live.remove(tgt)
            delta.append((tgt[0], float(tgt[1]), -1))
    schema = "g int, v double"
    base_df = spark.createDataFrame(
        [(g, float(v)) for g, v in base] or [], schema=schema
    )
    state = aggregate_state(base_df, ["g"], {"v": "total"})
    if delta:
        delta_df = spark.createDataFrame(
            delta, schema="g int, v double, _sign int"
        )
        state = apply_agg_delta(state, delta_df, ["g"], {"v": "total"})
    got = {(r.g): (r.n, float(r.total)) for r in state.collect()}
    model = {}
    for g, v in live:
        n, t = model.get(g, (0, 0.0))
        model[g] = (n + 1, t + v)
    assert got == {g: (n, t) for g, (n, t) in model.items() if n > 0}


@given(
    values=st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=20)
)
@settings(**_SETTINGS)
def test_label_encode_is_rank_of_count_then_value(spark, values):
    df = spark.createDataFrame([Row(v=v) for v in values])
    got = {r.v: r.v_idx for r in label_encode(df, "v").dropDuplicates().collect()}
    counts = {v: values.count(v) for v in set(values)}
    order = sorted(counts, key=lambda v: (-counts[v], v))
    assert got == {v: i for i, v in enumerate(order)}


# Bloom pre-filtered join must equal the plain join on ANY inputs —
# including empty sides, full overlap, and hash-collision-prone keys
from cdc_data_lake_pyspark_spark.operators.joinopt import (
    bloom_prefiltered_join,
    correlated_sample,
)

_keys = st.lists(st.integers(min_value=0, max_value=30), max_size=25)


@given(probe_keys=_keys, build_keys=_keys)
@settings(**_SETTINGS)
def test_bloom_join_equals_plain_join(spark, probe_keys, build_keys):
    probe = spark.createDataFrame(
        [(k, i) for i, k in enumerate(probe_keys)] or [], schema="k int, p int"
    )
    build = spark.createDataFrame(
        [(k, -i) for i, k in enumerate(set(build_keys))] or [],
        schema="k int, b int",
    )
    got = sorted(
        map(tuple, bloom_prefiltered_join(probe, build, "k").collect())
    )
    want = sorted(map(tuple, probe.join(build, "k").collect()))
    assert got == want


@given(keys=_keys, pct=st.integers(min_value=0, max_value=100))
@settings(**_SETTINGS)
def test_correlated_sample_is_pure_key_function(spark, keys, pct):
    df = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)] or [], schema="k int, v int"
    )
    kept = {r.k for r in correlated_sample(df, "k", keep_pct=pct).collect()}
    # a key is kept for ALL its rows or none: re-sampling a shuffled
    # frame keeps exactly the same key set
    kept2 = {
        r.k
        for r in correlated_sample(df.repartition(7), "k", keep_pct=pct).collect()
    }
    assert kept == kept2
    assert pct == 0 and kept == set() or pct > 0 or kept == set()
    if pct == 100:
        assert kept == set(keys)


# EWMA 8-term dyadic kernel vs a pure-Python model over a random series
@given(
    vals=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=20)
)
@settings(**_SETTINGS)
def test_ewma_terms_match_python_model(spark, vals):
    from cdc_data_lake_pyspark_spark.queries_phase8 import _ewma_terms

    rows = [(f"d{i:03d}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, schema="day string, rev_cents long")
    num, den = _ewma_terms(
        "rev_cents", lambda v, k: f"lag({v}, {k}) OVER (ORDER BY day)"
    )
    from pyspark.sql import functions as SF

    got = {
        r.day: (r.n, r.d)
        for r in df.selectExpr(
            "day", f"CAST({num} AS BIGINT) AS n", f"CAST({den} AS BIGINT) AS d"
        ).collect()
    }
    for i, (day, _) in enumerate(rows):
        n = sum(
            vals[i - k] * 2 ** (7 - k) for k in range(8) if i - k >= 0
        )
        d = sum(2 ** (7 - k) for k in range(8) if i - k >= 0)
        assert got[day] == (n, d)
