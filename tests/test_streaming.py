"""Streaming shell: file-source stream → foreachBatch → sink, with
checkpoint/restart idempotence (SURVEY §5.2)."""

import json
import os

from cdc_data_lake_pyspark_spark.apply import ParquetTableSink
from cdc_data_lake_pyspark_spark.pipeline import CdcPipeline
from cdc_data_lake_pyspark_spark.sources.files import read_json_lines_stream
from cdc_data_lake_pyspark_spark.sources.kafka import kafka_source_options
from cdc_data_lake_pyspark_spark.streaming import start_cdc_stream

_CFG = [{"db": "d", "table": "t", "primary_key": "id"}]


def _env(op, data, ts, before=None):
    return json.dumps(
        {
            "before": json.dumps(before) if before else None,
            "after": json.dumps(data) if data else None,
            "source": json.dumps({"db": "d", "table": "t"}),
            "op": op,
            "ts_ms": ts,
            "transaction": None,
        }
    )


def _write_batch(dirpath, name, lines):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, os.path.join(dirpath, name))


def test_file_stream_end_to_end_and_restart(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    sink_root = str(tmp_path / "lake")
    _write_batch(
        src,
        "b0.json",
        [
            _env("c", {"id": 1, "v": "a"}, 1),
            _env("c", {"id": 2, "v": "b"}, 2),
        ],
    )
    sink = ParquetTableSink(sink_root)
    pipe = CdcPipeline(config=_CFG, sink=sink)

    q = start_cdc_stream(
        read_json_lines_stream(spark, src),
        pipe,
        checkpoint_location=ckpt,
        available_now=True,
    )
    q.awaitTermination(120)
    got = {r.id: r.v for r in sink.read(spark, "d", "t").collect()}
    assert got == {1: "a", 2: "b"}

    # second run with new data: checkpoint resumes past b0 (no dup apply)
    _write_batch(
        src,
        "b1.json",
        [
            _env("u", {"id": 2, "v": "B"}, 3),
            _env("d", None, 4, before={"id": 1, "v": "a"}),
        ],
    )
    q2 = start_cdc_stream(
        read_json_lines_stream(spark, src),
        pipe,
        checkpoint_location=ckpt,
        available_now=True,
    )
    q2.awaitTermination(120)
    got = {r.id: r.v for r in sink.read(spark, "d", "t").collect()}
    assert got == {2: "B"}

    # third run with NO new data: nothing reprocessed, state unchanged
    q3 = start_cdc_stream(
        read_json_lines_stream(spark, src),
        pipe,
        checkpoint_location=ckpt,
        available_now=True,
    )
    q3.awaitTermination(120)
    got = {r.id: r.v for r in sink.read(spark, "d", "t").collect()}
    assert got == {2: "B"}


def test_kafka_options_reference_parity():
    opts = kafka_source_options("broker:9092", "t1,t2")
    assert opts["maxOffsetsPerTrigger"] == "200000"  # KafkaConnector.py:25
    assert opts["kafka.max.partition.fetch.bytes"] == "10485760"  # :26
    assert opts["failOnDataLoss"] == "false"  # :24
    assert opts["startingOffsets"] == "latest"
    assert opts["subscribe"] == "t1,t2"
    # timestamp start overrides offsets (emrserverless-v2.py:187-190)
    ts_opts = kafka_source_options("b", "t", starting_timestamp=1700000000000)
    assert ts_opts["startingTimestamp"] == "1700000000000"
    assert "startingOffsets" not in ts_opts
