"""Property tests for the phase-3 relational operators (the oracle gate
covers exact parity; these pin the semantic properties)."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.relational import (
    asof_join,
    hash_split,
    quantile_buckets,
    sessionize,
)


def _ts(minute):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minute)


def test_sessionize_gap_boundaries(spark):
    rows = [
        Row(event_id=1, user_id=1, ts=_ts(0)),
        Row(event_id=2, user_id=1, ts=_ts(30)),   # exactly the gap: same session
        Row(event_id=3, user_id=1, ts=_ts(61)),   # > gap after #2: new session
        Row(event_id=4, user_id=2, ts=_ts(0)),    # other key: independent
    ]
    out = {
        r.event_id: r.session_seq
        for r in sessionize(spark.createDataFrame(rows), gap="30 minutes").collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_asof_join_matches_bruteforce(spark):
    left = spark.createDataFrame(
        [Row(eid=i, k=i % 3, lts=_ts(i)) for i in range(30)]
    )
    right = spark.createDataFrame(
        [Row(k=i % 3, rts=_ts(i * 2), payload=i * 100) for i in range(10)]
    )
    got = {
        r.eid: (r.payload, r.asof_ts)
        for r in asof_join(
            left, right, "k", "k", "lts", "rts", right_cols=["payload"]
        ).collect()
    }
    # brute force: max-ts right row with rts <= lts per left row
    rrows = [(r.k, r.rts, r.payload) for r in right.collect()]
    for lrow in left.collect():
        cands = [(rts, p) for (k, rts, p) in rrows if k == lrow.k and rts <= lrow.lts]
        expect = max(cands) if cands else (None, None)
        assert got[lrow.eid] == (expect[1], expect[0]), f"eid={lrow.eid}"
    assert len(got) == 30  # left-outer: every left row survives


def test_hash_split_deterministic_and_partition(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(1000)])
    a = {r.doc_id: r.split for r in hash_split(df).collect()}
    b = {r.doc_id: r.split for r in hash_split(df.repartition(7)).collect()}
    assert a == b  # independent of physical layout
    counts = {s: list(a.values()).count(s) for s in ("train", "val", "test")}
    assert counts["train"] > 700 and counts["val"] > 50 and counts["test"] > 50
    assert sum(counts.values()) == 1000


def test_quantile_buckets_sizes(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, grp="a", v=float(i % 97)) for i in range(100)]
    )
    out = quantile_buckets(df, "v", n_buckets=10, partition_cols=["grp"]).collect()
    sizes = {}
    for r in out:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    assert sorted(sizes) == list(range(1, 11))
    assert all(size == 10 for size in sizes.values())
    # monotone: higher bucket never has a smaller max value than lower's min
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.v)
    for b in range(1, 10):
        assert max(by_bucket[b]) <= min(by_bucket[b + 1]) + 1e-9


def test_scd2_history_intervals_and_delete_closers(spark):
    """scd2_history: versions chain with half-open validity intervals
    per key; a delete-route row closes the prior version's interval but
    emits no version of its own, and a later re-insert starts a fresh
    open interval."""
    from cdc_data_lake_pyspark_spark.operators.relational import scd2_history

    rows = [
        # key 1: insert -> update -> delete -> re-insert
        (1, 10, "I", "insert"),
        (1, 20, "U", "update"),
        (1, 30, None, "delete"),
        (1, 40, "R", "insert"),
        # key 2: single current image
        (2, 15, "X", "insert"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, payload string, route string")
    got = {
        (r["k"], r["ts"]): (r["valid_to"], r["version"], r["is_current"])
        for r in scd2_history(
            df, ["k"], "ts", tiebreak_cols=[], route_col="route"
        ).collect()
    }
    assert got == {
        (1, 10): (20, 1, False),
        (1, 20): (30, 2, False),   # closed by the delete at ts=30
        (1, 40): (None, 3, True),  # re-insert opens a new interval
        (2, 15): (None, 1, True),
    }
    # no delete rows survive
    assert (1, 30) not in got

    # without a route column: plain versioned history
    plain = scd2_history(
        df.drop("route"), ["k"], "ts", tiebreak_cols=[]
    ).collect()
    assert sum(r["is_current"] for r in plain) == 2  # one open row per key
    assert max(r["version"] for r in plain if r["k"] == 1) == 4


def test_dq_report_counts_planted_violations(spark):
    """dq_report: nulls, range breaks, duplicate keys and FK orphans are
    each counted from planted bad rows; clean checks report zero."""
    from pyspark.sql import functions as F

    from cdc_data_lake_pyspark_spark.operators.quality import dq_report

    df = spark.createDataFrame(
        [
            (1, "a", 5.0, 10),
            (2, None, 0.5, 10),   # null name, below range
            (2, "c", -1.0, 99),   # duplicate id, below range, orphan fk
            (4, "d", 3.0, 20),
        ],
        "id long, name string, v double, fkey long",
    )
    dim = spark.createDataFrame([(10,), (20,)], "k long")
    got = {
        r["check"]: (r["violations"], r["total"])
        for r in dq_report(
            df,
            checks=[
                ("null_name", F.col("name").isNull()),
                ("v_min_1", F.col("v") < 1),
            ],
            unique_cols=["id"],
            fk=("orphan_fkey", "fkey", dim, "k"),
        ).collect()
    }
    assert got == {
        "null_name": (1, 4),
        "v_min_1": (2, 4),
        "dup_id": (1, 4),
        "orphan_fkey": (1, 4),
    }


def test_range_join_matches_bruteforce(spark):
    from cdc_data_lake_pyspark_spark.operators.relational import range_join

    # sub-second offsets included: the residual filter must compare
    # microsecond instants, not floored seconds
    left = spark.createDataFrame(
        [
            Row(lid=i, lk=i % 3, lts=_ts(0) + datetime.timedelta(seconds=7 * i, microseconds=300_000 * (i % 2)))
            for i in range(40)
        ]
    )
    right = spark.createDataFrame(
        [
            Row(rid=i, rk=i % 3, rts=_ts(0) + datetime.timedelta(seconds=5 * i, microseconds=700_000 * (i % 3)))
            for i in range(40)
        ]
    )
    got = {
        (r.lid, r.rid)
        for r in range_join(
            left, right, "lk", "rk", "lts", "rts", lower_s=10, upper_s=60
        ).collect()
    }
    lo = datetime.timedelta(seconds=10)
    hi = datetime.timedelta(seconds=60)
    want = {
        (lr.lid, rr.rid)
        for lr in left.collect()
        for rr in right.collect()
        if lr.lk == rr.rk and lr.lts + lo <= rr.rts < lr.lts + hi
    }
    assert got == want and want  # non-vacuous


def test_range_join_rejects_bad_args(spark):
    import pytest as _pytest

    from cdc_data_lake_pyspark_spark.operators.relational import range_join

    df = spark.createDataFrame([Row(k=1, ts=_ts(0))])
    with _pytest.raises(ValueError, match="upper_s"):
        range_join(df, df.withColumnRenamed("k", "k2").withColumnRenamed("ts", "ts2"), "k", "k2", "ts", "ts2", 60, 60)
    with _pytest.raises(ValueError, match="overlapping"):
        range_join(df, df, "k", "k", "ts", "ts", 0, 60)


def test_time_bucket_gapfill_dense_spine_and_locf(spark):
    from cdc_data_lake_pyspark_spark.operators.relational import (
        time_bucket_gapfill,
    )

    day = datetime.timedelta(days=1)
    d0 = datetime.datetime(2024, 3, 1, 5, 30)
    rows = [
        Row(g="a", ts=d0, v=1.5),
        Row(g="a", ts=d0 + 4 * day, v=2.5),   # 3-day gap inside group a
        Row(g="b", ts=d0 + 2 * day, v=10.0),  # b starts later, ends earlier
    ]
    out = time_bucket_gapfill(
        spark.createDataFrame(rows), "ts", "v", group_cols=("g",)
    ).collect()
    by = {(r.g, r.bucket.day): r for r in out}
    # every group densified onto the SAME corpus-wide 5-day spine
    assert sorted({d for (_, d) in by}) == [1, 2, 3, 4, 5]
    assert len(out) == 10
    # gap rows: zero count, null total, filled flag, LOCF carries forward
    gap = by[("a", 3)]
    assert gap.n_rows == 0 and gap.total is None and gap.filled
    assert gap.total_locf == 1.5
    assert by[("a", 5)].total == 2.5 and not by[("a", 5)].filled
    # group b: leading gap rows have NULL locf (nothing to carry)
    assert by[("b", 1)].total_locf is None
    assert by[("b", 3)].total == 10.0 and by[("b", 5)].total_locf == 10.0


def test_importance_weights_prefer_target_distribution(spark):
    from cdc_data_lake_pyspark_spark.operators.lm_quality import (
        importance_weights,
    )

    # target docs speak "alpha beta", raw background speaks "gamma delta";
    # a held-out alpha-beta doc must outscore a gamma-delta doc
    rows = (
        [Row(doc_id=i, text="alpha beta alpha beta", tgt=True) for i in range(5)]
        + [Row(doc_id=100 + i, text="gamma delta gamma delta", tgt=False) for i in range(5)]
        + [Row(doc_id=900, text="alpha beta", tgt=False),
           Row(doc_id=901, text="gamma delta", tgt=False)]
    )
    df = spark.createDataFrame(rows)
    out = {r.doc_id: r for r in importance_weights(df, F.col("tgt")).collect()}
    assert out[900].avg_logratio > out[901].avg_logratio
    assert out[900].logratio_micro > 0 > out[901].logratio_micro
    # weight is a per-token average: token counts preserved
    assert out[900].n_tokens == 2 and out[0].n_tokens == 4


def test_snapshot_diff_classifies_changes(spark):
    from cdc_data_lake_pyspark_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [Row(k=1, v="a", x=1.0), Row(k=2, v="b", x=2.0),
         Row(k=3, v="c", x=None), Row(k=4, v="d", x=4.0)]
    )
    new = spark.createDataFrame(
        [Row(k=2, v="b", x=2.0),          # unchanged: omitted
         Row(k=3, v="c", x=3.0),          # null -> value: update
         Row(k=4, v="D", x=4.0),          # string change: update
         Row(k=5, v="e", x=5.0)]          # insert
    )
    out = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(out) == {1, 3, 4, 5}  # k=2 unchanged, omitted
    assert out[1].change_type == "delete" and out[1].new_v is None
    assert out[3].change_type == "update" and out[3].old_x is None and out[3].new_x == 3.0
    assert out[4].change_type == "update" and (out[4].old_v, out[4].new_v) == ("d", "D")
    assert out[5].change_type == "insert" and out[5].old_v is None


def test_transition_matrix_counts_and_probs(spark):
    from cdc_data_lake_pyspark_spark.operators.mining import transition_matrix

    rows = [
        Row(event_id=i, user_id=u, ts=_ts(i), event_type=s)
        for i, (u, s) in enumerate(
            [(1, "a"), (1, "b"), (1, "a"), (1, "b"),   # user 1: a>b, b>a, a>b
             (2, "a"), (2, "c")]                        # user 2: a>c
        )
    ]
    out = {
        (r.from_state, r.to_state): (r.n, r.prob)
        for r in transition_matrix(spark.createDataFrame(rows)).collect()
    }
    assert out[("a", "b")] == (2, 2 / 3)
    assert out[("a", "c")] == (1, 1 / 3)
    assert out[("b", "a")] == (1, 1.0)
    # last event per user emits no transition
    assert ("b", None) not in out and ("c", None) not in out


def test_frequent_pairs_support_and_prune(spark):
    from cdc_data_lake_pyspark_spark.operators.mining import frequent_pairs

    rows = [
        Row(b=1, i="x"), Row(b=1, i="y"), Row(b=1, i="z"),
        Row(b=2, i="x"), Row(b=2, i="y"),
        Row(b=3, i="x"), Row(b=3, i="y"), Row(b=3, i="x"),  # dup item row
        Row(b=4, i="z"), Row(b=4, i="w"),                   # w infrequent
    ]
    out = {
        (r.item_a, r.item_b): r.support
        for r in frequent_pairs(
            spark.createDataFrame(rows), "b", "i", min_support=2
        ).collect()
    }
    # only (x, y) co-occurs in >= 2 baskets; (y, z)/(x, z)/(w, z) support 1
    assert out == {("x", "y"): 3}


def test_triangle_enumerate_matches_bruteforce(spark):
    import itertools

    from cdc_data_lake_pyspark_spark.operators.mining import (
        triangle_enumerate,
    )

    # K4 on {1..4} plus a pendant edge and a hub vertex 9 connected to
    # everything (exercises the degree orientation)
    base = list(itertools.combinations([1, 2, 3, 4], 2)) + [(5, 6)]
    edges = base + [(u, 9) for u in [1, 2, 3, 4, 5, 6]]
    df = spark.createDataFrame(
        [Row(item_a=min(u, v), item_b=max(u, v)) for u, v in edges]
    )
    got = {
        (r.v1, r.v2, r.v3) for r in triangle_enumerate(df).collect()
    }
    es = {frozenset(e) for e in edges}
    want = {
        (a, b, c)
        for a, b, c in itertools.combinations(sorted({x for e in edges for x in e}), 3)
        if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= es
    }
    assert got == want and len(want) == 4 + 6 + 1  # K4 + hub x K4-edges + hub-5-6


def test_pit_join_no_future_leakage(spark):
    """Point-in-time composition: each observation joins the version
    valid AT its timestamp — never a later one, never a stale skip."""
    from cdc_data_lake_pyspark_spark.operators.relational import (
        asof_join,
        scd2_history,
    )

    changes = spark.createDataFrame(
        [Row(k=1, eid=i, v=10 * i, ts=_ts(10 * i)) for i in range(1, 4)]
    )
    versions = scd2_history(changes, ["k"], "ts", tiebreak_cols=["eid"]).select(
        "k", "valid_from", "v", "version"
    )
    obs = spark.createDataFrame(
        [Row(oid=m, k=1, ots=_ts(m)) for m in [5, 10, 15, 25, 40]]
    )
    out = {
        r.oid: (r.v, r.version)
        for r in asof_join(
            obs, versions, "k", "k", "ots", "valid_from",
            right_cols=["v", "version"],
        ).collect()
    }
    assert out[5] == (None, None)          # before any version
    assert out[10] == (10, 1)              # boundary: valid_from <= ts
    assert out[15] == (10, 1)
    assert out[25] == (20, 2)
    assert out[40] == (30, 3)              # open current interval
