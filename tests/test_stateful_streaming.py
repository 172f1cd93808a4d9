"""Stateful streaming: cross-batch dedup + watermarked windowed counts."""

import json
import time

from pyspark.sql import types as T

from cdc_data_lake_pyspark_spark.streaming.stateful import (
    first_occurrence_only,
    windowed_event_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), True),
        T.StructField("v", T.StringType(), True),
    ]
)


def _run_stream(spark, df, name, build):
    q = (
        build(df)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_first_occurrence_only_across_batches(spark, tmp_path):
    """Two files + maxFilesPerTrigger=1 => two micro-batches; keys repeated
    across batches must be emitted exactly once, from their first batch."""
    d = tmp_path / "in"
    d.mkdir()
    # batch order over files is nondeterministic alphabetically? file source
    # processes in modification-time order; name + sleep make it stable.
    (d / "a.jsonl").write_text(
        "\n".join(json.dumps({"k": k, "v": f"a{k}"}) for k in [1, 2, 2, 3])
    )
    time.sleep(1.1)
    (d / "b.jsonl").write_text(
        "\n".join(json.dumps({"k": k, "v": f"b{k}"}) for k in [2, 3, 4])
    )
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
    )
    out = _run_stream(
        spark, src, "dedup_out", lambda s: first_occurrence_only(s, ["k"])
    )
    rows = {r.k: r.v for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1] == "a1" and rows[4] == "b4"
    # 2 and 3 first appeared in batch a
    assert rows[2].startswith("a") and rows[3].startswith("a")


def test_windowed_event_counts_finalize_with_watermark(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    base = "2024-01-01T00:{m:02d}:{s:02d}"

    def ev(m, s, u):
        return json.dumps({"ts": base.format(m=m, s=s), "user_id": u})

    # batch 1: events in minutes 0 and 1; batch 2 advances the watermark far
    # enough (minute 10) to finalize those windows in append mode.
    (d / "a.jsonl").write_text(
        "\n".join([ev(0, 10, 1), ev(0, 40, 1), ev(1, 5, 1), ev(0, 20, 2)])
    )
    time.sleep(1.1)
    (d / "b.jsonl").write_text(ev(10, 0, 1))
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
        ]
    )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
    )
    out = _run_stream(
        spark,
        src,
        "win_out",
        lambda s: windowed_event_counts(s, window_duration="1 minute",
                                        watermark_delay="2 minutes"),
    )
    got = {
        (r.window_start.minute, r.user_id): r.n_events
        for r in out.collect()
    }
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 1
    assert got[(0, 2)] == 1


def test_session_windows_merge_across_batches(spark, tmp_path):
    from cdc_data_lake_pyspark_spark.streaming.stateful import (
        session_event_counts,
    )

    d = tmp_path / "sess"
    d.mkdir()
    base = "2024-01-01T00:{m:02d}:{s:02d}"

    def ev(m, s, u):
        return json.dumps({"ts": base.format(m=m, s=s), "user_id": u})

    # user 1: burst at 00:00:00-00:00:30, silence > 1 min, burst at 00:03:00;
    # batch 2 EXTENDS the second burst (00:03:40 within the gap) — session
    # merging across micro-batches — and a far-future event finalizes all.
    (d / "a.jsonl").write_text(
        "\n".join([ev(0, 0, 1), ev(0, 30, 1), ev(3, 0, 1), ev(0, 10, 2)])
    )
    time.sleep(1.1)
    (d / "b.jsonl").write_text("\n".join([ev(3, 40, 1), ev(30, 0, 9)]))
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
        ]
    )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
    )
    out = _run_stream(
        spark,
        src,
        "sess_out",
        lambda s: session_event_counts(
            s, gap="1 minute", watermark_delay="1 minute"
        ),
    )
    got = {
        (r.user_id, r.session_start.minute): r.n_events for r in out.collect()
    }
    # user 1: session @0 has 2 events; session @3 merged across batches -> 2
    assert got[(1, 0)] == 2
    assert got[(1, 3)] == 2
    assert got[(2, 0)] == 1
