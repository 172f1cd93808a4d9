"""Stream-stream interval join (streaming/joins.py)."""

import json
import time

from pyspark.sql import types as T

from cdc_data_lake_pyspark_spark.streaming.joins import interval_stream_join

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_id", T.LongType(), True),
    ]
)


def _ev(m, u, i):
    return json.dumps(
        {"ts": f"2024-01-01T{m // 60:02d}:{m % 60:02d}:00", "user_id": u, "event_id": i}
    )


def test_clicks_join_purchases_within_lookback(spark, tmp_path):
    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir()
    buys_dir.mkdir()
    # user 1 clicks at minute 0 and 50; purchase at minute 55 —
    # only the minute-50 click is within the 30-minute lookback.
    # user 2's click is from another user than the purchase: no match.
    (clicks_dir / "c.jsonl").write_text(
        "\n".join([_ev(0, 1, 10), _ev(50, 1, 11), _ev(52, 2, 12)])
    )
    (buys_dir / "b.jsonl").write_text("\n".join([_ev(55, 1, 20)]))
    time.sleep(0.2)

    clicks = spark.readStream.schema(SCHEMA).json(str(clicks_dir))
    buys = spark.readStream.schema(SCHEMA).json(str(buys_dir))
    joined = interval_stream_join(
        buys,
        clicks,
        lookback="30 minutes",
        watermark="2 hours",
        left_prefix="p_",
        right_prefix="c_",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        (r["p_event_id"], r["c_event_id"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    ]
    assert rows == [(20, 11)]
