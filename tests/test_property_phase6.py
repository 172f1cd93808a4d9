"""Property-based semantics for the phase-6 relational operators: random
inputs must match pure-Python reference models (same contract as
test_property_cdc.py — the oracle gate pins exact engine parity on the
driver tables; these pin the SEMANTICS on adversarial shapes:
duplicate timestamps, empty sides, boundary-exact instants, all-null
diff columns)."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from cdc_data_lake_pyspark_spark.operators.mining import frequent_pairs
from cdc_data_lake_pyspark_spark.operators.relational import (
    range_join,
    snapshot_diff,
)

T0 = datetime.datetime(2024, 1, 1)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, offset-seconds, micros) rows; micros exercise sub-second
# boundary behavior, offsets land on and around the window edges
_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=120),
        st.sampled_from([0, 1, 999_999]),
    ),
    max_size=14,
)


@given(left=_rows, right=_rows)
@settings(**_SETTINGS)
def test_range_join_equals_model(spark, left, right):
    lrows = [
        Row(lid=i, lk=k, lts=T0 + datetime.timedelta(seconds=s, microseconds=us))
        for i, (k, s, us) in enumerate(left)
    ]
    rrows = [
        Row(rid=i, rk=k, rts=T0 + datetime.timedelta(seconds=s, microseconds=us))
        for i, (k, s, us) in enumerate(right)
    ]
    if not lrows or not rrows:
        return
    got = {
        (r.lid, r.rid)
        for r in range_join(
            spark.createDataFrame(lrows),
            spark.createDataFrame(rrows),
            "lk", "rk", "lts", "rts", lower_s=5, upper_s=35,
        ).collect()
    }
    lo, hi = datetime.timedelta(seconds=5), datetime.timedelta(seconds=35)
    want = {
        (lr.lid, rr.rid)
        for lr in lrows
        for rr in rrows
        if lr.lk == rr.rk and lr.lts + lo <= rr.rts < lr.lts + hi
    }
    assert got == want


_snap = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),             # key
        st.one_of(st.none(), st.integers(0, 3)),           # value (nullable)
    ),
    max_size=10,
    unique_by=lambda t: t[0],
)


@given(old=_snap, new=_snap)
@settings(**_SETTINGS)
def test_snapshot_diff_equals_model(spark, old, new):
    if not old and not new:
        return
    schema = "k int, v int"
    got = {
        r.k: (r.change_type, r.old_v, r.new_v)
        for r in snapshot_diff(
            spark.createDataFrame([Row(k=k, v=v) for k, v in old] or [], schema),
            spark.createDataFrame([Row(k=k, v=v) for k, v in new] or [], schema),
            ["k"],
        ).collect()
    }
    om, nm = dict(old), dict(new)
    want = {}
    for k in set(om) | set(nm):
        if k not in om:
            want[k] = ("insert", None, nm[k])
        elif k not in nm:
            want[k] = ("delete", om[k], None)
        elif om[k] != nm[k]:  # null-safe: None != x is a change, None == None is not
            want[k] = ("update", om[k], nm[k])
    assert got == want


_baskets = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 4)),  # (basket, item)
    max_size=20,
)


@given(rows=_baskets, support=st.integers(min_value=1, max_value=3))
@settings(**_SETTINGS)
def test_frequent_pairs_equals_model(spark, rows, support):
    if not rows:
        return
    got = {
        (r.item_a, r.item_b): r.support
        for r in frequent_pairs(
            spark.createDataFrame([Row(b=b, i=i) for b, i in rows]),
            "b", "i", min_support=support,
        ).collect()
    }
    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    from collections import Counter

    pair_counts = Counter(
        (a, c)
        for items in baskets.values()
        for a in items
        for c in items
        if a < c
    )
    want = {p: n for p, n in pair_counts.items() if n >= support}
    assert got == want
