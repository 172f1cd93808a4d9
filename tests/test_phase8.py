"""Phase-8 operator tests: bounded multi-source BFS and the CUBE
grouping-set lattice."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.graph import bfs_distances


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=s, dst=d) for s, d in pairs])


def _seeds(spark, nodes):
    return spark.createDataFrame([Row(node=n) for n in nodes])


# ---------------------------------------------------------------- BFS
def test_bfs_line_graph_exact_distances(spark):
    # 1 -> 2 -> 3 -> 4 -> 5 -> 6; seed 1, 4 hops: node 6 is out of reach
    e = _edges(spark, [(i, i + 1) for i in range(1, 6)])
    out = {
        r.node: r.dist
        for r in bfs_distances(e, _seeds(spark, [1]), max_hops=4).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_multi_source_takes_nearest_seed(spark):
    # 1 -> 2 -> 3 and 5 -> 4 -> 3: node 3 is 2 hops from both seeds,
    # node 4 is 1 hop from seed 5 (not 3+ from seed 1)
    e = _edges(spark, [(1, 2), (2, 3), (5, 4), (4, 3)])
    out = {
        r.node: r.dist
        for r in bfs_distances(e, _seeds(spark, [1, 5]), max_hops=4).collect()
    }
    assert out == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_cycle_terminates_and_settles_first_reach(spark):
    # triangle cycle plus a tail; first-reach wins, loop doesn't spin
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    out = {
        r.node: r.dist
        for r in bfs_distances(e, _seeds(spark, [1]), max_hops=4).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_unreachable_nodes_absent(spark):
    e = _edges(spark, [(1, 2), (7, 8)])  # 7/8 disconnected from seed
    out = bfs_distances(e, _seeds(spark, [1]), max_hops=4)
    assert {r.node for r in out.collect()} == {1, 2}


def test_bfs_respects_edge_direction(spark):
    e = _edges(spark, [(2, 1)])  # only an IN-edge to the seed
    out = bfs_distances(e, _seeds(spark, [1]), max_hops=3)
    assert {r.node: r.dist for r in out.collect()} == {1: 0}


# ---------------------------------------------------------------- CUBE
def test_cube_lattice_subtotals_and_grouping_id(spark):
    df = spark.createDataFrame(
        [
            Row(a="x", b="p", v=1),
            Row(a="x", b="q", v=2),
            Row(a="y", b="p", v=4),
        ]
    )
    out = {
        (r.gid, r.a, r.b): r.total
        for r in df.cube("a", "b")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum("v").alias("total"),
        )
        .collect()
    }
    # gid bitmask: leftmost cube column = most significant bit; bit set
    # means the dimension is rolled away (matches DuckDB GROUPING())
    assert out[(0, "x", "p")] == 1
    assert out[(0, "x", "q")] == 2
    assert out[(1, "x", None)] == 3  # b rolled away
    assert out[(1, "y", None)] == 4
    assert out[(2, None, "p")] == 5  # a rolled away
    assert out[(2, None, "q")] == 2
    assert out[(3, None, None)] == 7  # grand total
    assert len(out) == 3 + 2 + 2 + 1


# ---------------------------------------------------------------- features
from cdc_data_lake_pyspark_spark.operators.features import (
    feature_hash,
    label_encode,
    standardize_components,
)


def test_label_encode_frequency_order_with_lexicographic_ties(spark):
    df = spark.createDataFrame(
        [Row(v="b")] * 3 + [Row(v="c")] * 2 + [Row(v="a")] * 2 + [Row(v="z")]
    )
    idx = {
        r.v: r.v_idx for r in label_encode(df, "v").dropDuplicates().collect()
    }
    # b most frequent -> 0; a/c tie at 2 breaks lexicographically; z last
    assert idx == {"b": 0, "a": 1, "c": 2, "z": 3}


def test_feature_hash_buckets_bounded_and_deterministic(spark):
    df = spark.createDataFrame(
        [Row(id=1, t="red green blue red"), Row(id=2, t="red")]
    )
    out = feature_hash(df, "id", "t", n_buckets=8).collect()
    assert all(0 <= r.bucket < 8 for r in out)
    # same token -> same bucket in every row: doc 2's 'red' bucket must
    # appear in doc 1 with tf 2
    red = next(r.bucket for r in out if r.id == 2)
    assert any(r.id == 1 and r.bucket == red and r.tf >= 2 for r in out)
    again = feature_hash(df, "id", "t", n_buckets=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_standardize_zero_variance_dim_yields_null(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, vec=[1.0, 5.0]),
            Row(id=2, vec=[1.0, 7.0]),
        ]
    )
    rows = standardize_components(df, "id", "vec").collect()
    d0 = [r for r in rows if r.dim == 0]
    d1 = sorted((r for r in rows if r.dim == 1), key=lambda r: r.id)
    assert all(r.z is None for r in d0)  # constant dim
    # dim 1: values 5,7 -> mean 6, pop std 1 -> z = -1, +1
    assert abs(d1[0].z + 1.0) < 1e-9 and abs(d1[1].z - 1.0) < 1e-9


# ---------------------------------------------------------------- IVM
from cdc_data_lake_pyspark_spark.operators.ivm import (
    aggregate_state,
    apply_agg_delta,
)


def _state_map(df):
    return {
        r.g: (r.n, float(r.total)) for r in df.collect()
    }


def test_ivm_insert_delete_update_and_group_lifecycle(spark):
    base = spark.createDataFrame(
        [Row(g="a", v=10.0), Row(g="a", v=20.0), Row(g="b", v=5.0)]
    )
    state = aggregate_state(base, ["g"], {"v": "total"})
    delta = spark.createDataFrame(
        [
            Row(g="c", v=7.0, _sign=1),   # insert creates a new group
            Row(g="b", v=5.0, _sign=-1),  # delete empties group b
            Row(g="a", v=20.0, _sign=-1),  # update = delete old image...
            Row(g="a", v=25.0, _sign=1),   # ...plus insert new image
        ]
    )
    out = _state_map(
        apply_agg_delta(state, delta, ["g"], {"v": "total"})
    )
    assert out == {"a": (2, 35.0), "c": (1, 7.0)}  # b dropped at n=0


def test_ivm_incremental_equals_recompute(spark):
    rows = [Row(g=f"g{i % 5}", v=float(i)) for i in range(100)]
    base = spark.createDataFrame(rows[:70])
    state = aggregate_state(base, ["g"], {"v": "total"})
    delta = spark.createDataFrame(
        [Row(g=r.g, v=r.v, _sign=1) for r in rows[70:]]
        + [Row(g=r.g, v=r.v, _sign=-1) for r in rows[:10]]
    )
    incremental = _state_map(
        apply_agg_delta(state, delta, ["g"], {"v": "total"})
    )
    recompute = _state_map(
        aggregate_state(spark.createDataFrame(rows[10:]), ["g"], {"v": "total"})
    )
    assert incremental == recompute


def test_label_encode_multi_matches_per_column_encoding(spark):
    from cdc_data_lake_pyspark_spark.operators.features import (
        label_encode_multi,
    )

    df = spark.createDataFrame(
        [
            Row(id=1, a="x", b="p"),
            Row(id=2, a="x", b="q"),
            Row(id=3, a="y", b="q"),
            Row(id=4, a="y", b="q"),
            Row(id=5, a="y", b="r"),
        ]
    )
    multi = {
        r.id: (r.a_idx, r.b_idx)
        for r in label_encode_multi(df, ["a", "b"]).collect()
    }
    ea = {r.a: r.a_idx for r in label_encode(df, "a").collect()}
    eb = {r.b: r.b_idx for r in label_encode(df, "b").collect()}
    rows = {r.id: (r.a, r.b) for r in df.collect()}
    assert multi == {i: (ea[a], eb[b]) for i, (a, b) in rows.items()}


# ---------------------------------------------------------------- joinopt
from cdc_data_lake_pyspark_spark.operators.joinopt import (
    bloom_prefiltered_join,
    correlated_sample,
)


def test_bloom_prefilter_join_equals_plain_join_and_reduces(spark):
    import pytest as _pytest

    probe = spark.createDataFrame(
        [Row(k=i, v=i * 10) for i in range(1000)]
    )
    build = spark.createDataFrame(
        [Row(k=i, w=f"w{i}") for i in range(0, 1000, 100)]  # 10 keys
    )
    out = bloom_prefiltered_join(probe, build, "k")
    plain = probe.join(build, "k")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the pre-filter itself must discard (nearly) all non-matching rows:
    # false-positive rate at depth 4 / 64k bits / 10 keys is ~0
    pre_rows = bloom_prefiltered_join(
        probe, build, "k", how="left_semi"
    ).count()
    assert pre_rows == 10
    with _pytest.raises(ValueError):
        bloom_prefiltered_join(probe, build, "k", how="left")


def test_correlated_sample_preserves_join_structure(spark):
    parents = spark.createDataFrame([Row(k=i) for i in range(500)])
    children = spark.createDataFrame(
        [Row(k=i, c=j) for i in range(500) for j in range(3)]
    )
    ps, cs = correlated_sample(parents, "k"), correlated_sample(children, "k")
    sampled_keys = {r.k for r in ps.collect()}
    assert 10 <= len(sampled_keys) <= 100  # ~10% of 500
    # every sampled parent keeps ALL its children — no orphans either way
    joined = ps.join(cs, "k")
    assert joined.count() == 3 * len(sampled_keys)
    assert {r.k for r in cs.collect()} == sampled_keys


def test_quota_sample_plans_two_phase_group_limit(spark):
    """r9 plan pin: the quota entry's ``rk <= 50`` filter over a ranked
    window must compile to Spark's two-phase WindowGroupLimit (a partial
    per-partition top-k BEFORE the stratum shuffle, then a final one) —
    the property that bounds per-group memory at 100 TB, which the
    docstring claims.  If a refactor breaks the pushdown (e.g. by
    referencing the rank through an opaque subquery), this fails before
    SCALE.md's claim goes stale."""
    from cdc_data_lake_pyspark_spark.queries import queries

    df = queries()["quota_sample_docs"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2, plan[:2000]
