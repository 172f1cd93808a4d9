"""Continuous aggregate: streaming windowed rollup maintained via MERGE
(streaming/rollup.py)."""

import json
import time

from pyspark.sql import types as T

from cdc_data_lake_pyspark_spark.apply import MemoryTableSink
from cdc_data_lake_pyspark_spark.config import TableConfig
from cdc_data_lake_pyspark_spark.streaming.rollup import start_continuous_rollup

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _ev(m, s, u, v):
    return json.dumps(
        {"ts": f"2024-01-01T00:{m:02d}:{s:02d}", "user_id": u, "value": v}
    )


def test_rollup_totals_update_across_batches(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # batch 1: two events for user 1 in minute 0, one for user 2 in minute 1
    (d / "a.jsonl").write_text(
        "\n".join([_ev(0, 5, 1, 10.0), _ev(0, 40, 1, 2.5), _ev(1, 10, 2, 7.0)])
    )
    time.sleep(1.1)
    # batch 2: a THIRD event in user 1's minute-0 window — the update-mode
    # re-emission must overwrite the sink row with the merged total, and a
    # new user-3 row lands alongside.
    (d / "b.jsonl").write_text("\n".join([_ev(0, 55, 1, 1.5), _ev(2, 0, 3, 4.0)]))

    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
    )
    sink = MemoryTableSink()
    cfg = TableConfig(db="agg", table="by_min", primary_key="window_start,user_id")
    q = start_continuous_rollup(
        src,
        sink,
        cfg,
        checkpoint_location=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)

    rows = {
        (r["user_id"], r["window_start"].minute): (
            r["n_events"],
            float(r["value_sum"]),
        )
        for r in sink.tables[("agg", "by_min")].collect()
    }
    assert rows[(1, 0)] == (3, 14.0)  # merged total, not the batch-1 value
    assert rows[(2, 1)] == (1, 7.0)
    assert rows[(3, 2)] == (1, 4.0)
