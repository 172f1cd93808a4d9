"""Property-based CDC semantics: random event batches must match the pure
reduction model (SURVEY §5.2 — duplicate keys, delete-then-insert,
multi-op interleavings).

Batch semantics under test (reference transaction_log_util.py:78-168):
routes apply in insert → upsert → delete order within a batch; the upsert
route dedups to the latest change per key by ts_ms; merge replaces every
existing row of a matched key with the single update row; delete drops
every row whose key appears on the delete route.
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_data_lake_pyspark_spark.apply import MemoryTableSink
from cdc_data_lake_pyspark_spark.pipeline import CdcPipeline

CONFIG = [{"db": "testdb", "table": "t", "primary_key": "k"}]

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),        # key
        st.sampled_from(["r", "c", "u", "d"]),        # op
        st.integers(min_value=0, max_value=99),       # value
    ),
    max_size=25,
)


def _envelope(key: int, op: str, val: int, ts: int) -> str:
    payload = json.dumps({"k": key, "v": val})
    return json.dumps(
        {
            "before": payload if op == "d" else None,
            "after": None if op == "d" else payload,
            "source": json.dumps({"db": "testdb", "table": "t"}),
            "op": op,
            "ts_ms": ts,
            "transaction": None,
        }
    )


def _expected(events) -> list[tuple[int, int]]:
    """The reduction model: sorted (k, v) multiset of the final state."""
    ins = [(k, v) for (k, op, v) in events if op in ("r", "c")]
    ups: dict[int, tuple[int, int]] = {}
    for ts, (k, op, v) in enumerate(events):
        if op == "u":
            ups[k] = (k, v)  # later event (higher ts) wins
    dels = {k for (k, op, v) in events if op == "d"}
    after_merge = [p for p in ins if p[0] not in ups] + list(ups.values())
    return sorted(p for p in after_merge if p[0] not in dels)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy)
def test_random_batches_match_reduction_model(spark, events):
    values = [
        (_envelope(k, op, v, ts),) for ts, (k, op, v) in enumerate(events)
    ]
    sink = MemoryTableSink()
    pipe = CdcPipeline(config=CONFIG, sink=sink)
    if values:
        batch = spark.createDataFrame(values, "value string")
        pipe.process_batch(batch)
    if ("testdb", "t") in sink.tables:
        got = sorted(
            (r.k, r.v) for r in sink.read(spark, "testdb", "t").collect()
        )
    else:
        got = []
    assert got == _expected(events)
