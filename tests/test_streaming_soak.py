"""Streaming soak at sf0.1: the flagship CDC envelope set, split into six
ts-ordered micro-batches, streamed through ``SqlTableSink`` on the
LocalLake catalog (real executed append / MERGE INTO / DELETE WHERE
EXISTS) across checkpoint restarts — including one restart taken while
data is still pending — and the final table state must equal the one-shot
batch apply (reference deployment shape: stream → foreachBatch → Iceberg,
kafka-iceberg-streaming-emrserverless-v2.py:218-225).

Slices are cut by envelope ``ts_ms`` (a CDC log is per-key ordered; each
key's read < update < delete timestamps), so replaying them in order is
exactly a resumable ordered stream.  One slice is fed per stream run —
file-source listing order across runs is then irrelevant — and the
pipeline runs with ``ts_guard`` so cross-batch ordering is enforced the
way the engine documents it.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.apply import MemoryTableSink, SqlTableSink
from cdc_data_lake_pyspark_spark.fixtures import (
    ORDERS_TABLE_CONFIG,
    debezium_orders_envelopes,
)
from cdc_data_lake_pyspark_spark.pipeline import CdcPipeline
from cdc_data_lake_pyspark_spark.streaming.runner import start_cdc_stream

SOAK_SF_DIR = os.environ.get("SPARK_GRAFT_SOAK_SF_DIR", "/root/testdata/sf0.1")
N_SLICES = 6


@pytest.fixture()
def lake(spark):
    from cdc_data_lake_pyspark_spark.catalog import clear_all, ensure_compiled, register

    if ensure_compiled() is None:
        pytest.skip("no JDK compiler for LocalLakeCatalog")
    register(spark, "locallake")
    clear_all(spark)
    yield "locallake"
    clear_all(spark)


def _ts_ordered_slices(env):
    """Split the envelope frame into N ts-ordered slices (ntile over the
    envelope timestamp; per-key event order is preserved across slices)."""
    ts = F.get_json_object("value", "$.ts_ms").cast("long")
    w = Window.orderBy(ts.asc(), F.col("value").asc())
    sliced = env.select("value", F.ntile(N_SLICES).over(w).alias("_slice"))
    return sliced.localCheckpoint()


def _drain(spark, src_dir, pipe, ckpt):
    """One availableNow stream run over whatever is in src_dir; returns the
    number of committed triggers that moved rows."""
    stream = spark.readStream.format("text").schema("value string").load(src_dir)
    q = start_cdc_stream(
        stream, pipe, ckpt, available_now=True, query_name="soak_stream"
    )
    q.awaitTermination(600)
    return sum(1 for p in q.recentProgress if p["numInputRows"] > 0)


def test_soak_sliced_stream_matches_batch(spark, lake, tmp_path):
    if not os.path.isdir(SOAK_SF_DIR):
        pytest.skip(f"no test data at {SOAK_SF_DIR}")
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    env = debezium_orders_envelopes(spark, SOAK_SF_DIR).localCheckpoint()
    sliced = _ts_ordered_slices(env)

    sink = SqlTableSink(lake)
    pipe = CdcPipeline(config=ORDERS_TABLE_CONFIG, sink=sink, ts_guard="_cdc_ts")

    triggers = 0
    # slices 1..4: write one slice, drain it, stop — every boundary is a
    # checkpoint restart (fresh query object, same checkpoint)
    for i in range(1, N_SLICES - 1):
        sliced.filter(F.col("_slice") == i).select("value").coalesce(1).write.mode(
            "append"
        ).text(src)
        triggers += _drain(spark, src, pipe, ckpt)

    # slice 5: processed by a long-interval query which is then STOPPED
    # while slice 6 (written during its idle window) is still pending —
    # the mid-stream restart
    sliced.filter(F.col("_slice") == N_SLICES - 1).select("value").coalesce(
        1
    ).write.mode("append").text(src)
    stream = spark.readStream.format("text").schema("value string").load(src)
    q = start_cdc_stream(
        stream, pipe, ckpt, trigger_seconds=300, query_name="soak_stream_mid"
    )
    deadline = time.time() + 600
    while time.time() < deadline:
        lp = q.lastProgress
        if lp and lp["numInputRows"] > 0:
            break
        time.sleep(0.5)
    else:
        q.stop()
        pytest.fail("slice 5 never committed")
    # pending data arrives while the query idles in its 300 s window...
    sliced.filter(F.col("_slice") == N_SLICES).select("value").coalesce(1).write.mode(
        "append"
    ).text(src)
    triggers += 1
    q.stop()  # ...and the stop strands it for the restarted query
    q.awaitTermination(120)

    triggers += _drain(spark, src, pipe, ckpt)
    assert triggers >= 5, f"expected a real multi-trigger soak, got {triggers}"

    # batch path: the same envelopes applied as ONE batch
    mem = MemoryTableSink()
    CdcPipeline(
        config=ORDERS_TABLE_CONFIG, sink=mem, ts_guard="_cdc_ts"
    ).process_batch(env)

    streamed = spark.table(f"{lake}.`testdb`.`orders`")
    batch = mem.read(spark, "testdb", "orders")
    assert sorted(streamed.columns) == sorted(batch.columns)
    streamed = streamed.select(*sorted(streamed.columns))
    batch = batch.select(*sorted(batch.columns))
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()
