"""CLI entry point: argument surface parity + a file-source end-to-end run."""

import json

import pytest

from cdc_data_lake_pyspark_spark.cli import (
    build_arg_parser,
    catalog_session_conf,
    main,
    make_sink,
)


def test_reference_flag_surface_parses():
    """Every long flag of the reference entry point is accepted
    (kafka-iceberg-streaming-emrserverless-v2.py:56-115)."""
    args = build_arg_parser().parse_args(
        [
            "--jobname", "j",
            "--starting_offsets_of_kafka_topic", "earliest",
            "--topics", "t1,t2",
            "--icebergdb", "db",
            "--warehouse", "s3://wh",
            "--tablejsonfile", "tables.json",
            "--region", "us-east-1",
            "--kafkaserver", "b:9092",
            "--checkpointpath", "/tmp/cp",
            "--sourcetype", "kafka",
            "--cdcformat", "dms",
            "--catalogtype", "glue",
            "--catalogname", "glue_catalog",
        ]
    )
    assert args.starting_offsets == "earliest"
    assert args.cdcformat == "dms"
    assert args.catalogtype == "glue"


def test_catalog_conf_glue_and_s3table():
    p = build_arg_parser()
    base = ["--tablejsonfile", "t.json", "--checkpointpath", "/tmp/cp",
            "--warehouse", "s3://wh", "--catalogname", "c"]
    glue = catalog_session_conf(p.parse_args(base + ["--catalogtype", "glue"]))
    assert glue["spark.sql.catalog.c.catalog-impl"].endswith("GlueCatalog")
    s3t = catalog_session_conf(p.parse_args(base + ["--catalogtype", "s3table"]))
    assert s3t["spark.sql.catalog.c.catalog-impl"].endswith("S3TablesCatalog")
    assert "spark.sql.extensions" in glue
    none = catalog_session_conf(p.parse_args(base))
    assert none == {}


def test_sink_selection_requires_root():
    p = build_arg_parser()
    args = p.parse_args(
        ["--tablejsonfile", "t.json", "--checkpointpath", "/tmp/cp",
         "--sink", "parquet"]
    )
    with pytest.raises(SystemExit):
        make_sink(args)


def test_cli_file_source_end_to_end(spark, sf_dir, tmp_path):
    """Full CLI run: file source -> debezium parse -> parquet sink."""
    from cdc_data_lake_pyspark_spark.fixtures import (
        ORDERS_TABLE_CONFIG,
        debezium_orders_envelopes,
    )

    src = tmp_path / "events"
    src.mkdir()
    env = debezium_orders_envelopes(spark, sf_dir)
    with open(src / "batch.jsonl", "w") as f:
        for r in env.collect():
            f.write(r.value + "\n")
    conf = tmp_path / "tables.json"
    conf.write_text(json.dumps(ORDERS_TABLE_CONFIG))
    sink_root = tmp_path / "lake"

    main(
        [
            "--tablejsonfile", str(conf),
            "--checkpointpath", str(tmp_path / "cp"),
            "--sourcetype", "file",
            "--source-path", str(src),
            "--sink", "parquet",
            "--sink-root", str(sink_root),
            "--available-now",
        ]
    )
    out = spark.read.parquet(str(sink_root / "testdb" / "orders"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = orders.filter("o_orderkey % 10 <> 9").count()
    assert out.count() == expected


def test_cli_locallake_sink_end_to_end(spark, sf_dir, tmp_path):
    """Full CLI run into the executed-SQL sink: file source -> debezium
    parse -> SqlTableSink on the LocalLake DSv2 catalog (real CREATE /
    MERGE INTO / DELETE through Spark's row-level rewrite rules)."""
    from cdc_data_lake_pyspark_spark.catalog import clear_all, ensure_compiled, register

    if not ensure_compiled():
        import pytest

        pytest.skip("LocalLake catalog not compilable here")
    from cdc_data_lake_pyspark_spark.fixtures import (
        ORDERS_TABLE_CONFIG,
        debezium_orders_envelopes,
    )

    register(spark, "locallake")
    clear_all(spark)
    src = tmp_path / "events"
    src.mkdir()
    env = debezium_orders_envelopes(spark, sf_dir)
    with open(src / "batch.jsonl", "w") as f:
        for r in env.collect():
            f.write(r.value + "\n")
    conf = tmp_path / "tables.json"
    conf.write_text(json.dumps(ORDERS_TABLE_CONFIG))

    main(
        [
            "--tablejsonfile", str(conf),
            "--checkpointpath", str(tmp_path / "cp"),
            "--sourcetype", "file",
            "--source-path", str(src),
            "--sink", "locallake",
            "--available-now",
        ]
    )
    out = spark.table("locallake.testdb.orders")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = orders.filter("o_orderkey % 10 <> 9").count()
    assert out.count() == expected


def test_cli_maintenance_compact_end_to_end(spark, tmp_path, capsys):
    import pyspark.sql.functions as SF

    from cdc_data_lake_pyspark_spark.cli import main

    src, dst = str(tmp_path / "frag"), str(tmp_path / "packed")
    spark.range(0, 5000).withColumn("v", SF.col("id") % 7).repartition(
        32
    ).write.parquet(src)
    main(
        [
            "--maintenance", "compact",
            "--compact-src", src,
            "--compact-dst", dst,
            "--compact-target-mb", "512",
            "--catalogtype", "none",
        ]
    )
    out = spark.read.parquet(dst)
    assert out.count() == 5000 and len(out.inputFiles()) == 1
    assert "compacted" in capsys.readouterr().out


def test_cli_streaming_still_requires_config_flags():
    import pytest as _pytest

    from cdc_data_lake_pyspark_spark.cli import main

    with _pytest.raises(SystemExit):
        main(["--catalogtype", "none"])  # no tablejsonfile/checkpointpath


def test_cli_quarantine_end_to_end(spark, sf_dir, tmp_path):
    """Planted bad envelopes (blank line, malformed JSON) land in the
    quarantine store with their check names while every good row still
    applies — J3 log-and-continue with retention instead of loss."""
    from cdc_data_lake_pyspark_spark.fixtures import (
        ORDERS_TABLE_CONFIG,
        debezium_orders_envelopes,
    )
    from cdc_data_lake_pyspark_spark.streaming.quarantine import (
        read_quarantine,
    )

    src = tmp_path / "events"
    src.mkdir()
    env = debezium_orders_envelopes(spark, sf_dir)
    with open(src / "batch.jsonl", "w") as f:
        for r in env.collect():
            f.write(r.value + "\n")
        f.write(" \n")  # blank -> null_or_empty_value
        f.write('{"this is": not json}\n')  # -> unparseable_json
        f.write("also not json at all\n")  # -> unparseable_json
    conf = tmp_path / "tables.json"
    conf.write_text(json.dumps(ORDERS_TABLE_CONFIG))
    sink_root = tmp_path / "lake"
    qdir = tmp_path / "quarantine"

    main(
        [
            "--tablejsonfile", str(conf),
            "--checkpointpath", str(tmp_path / "cp"),
            "--sourcetype", "file",
            "--source-path", str(src),
            "--sink", "parquet",
            "--sink-root", str(sink_root),
            "--available-now",
            "--quarantine", str(qdir),
        ]
    )
    # clean rows applied exactly as the quarantine-less run would
    out = spark.read.parquet(str(sink_root / "testdb" / "orders"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = orders.filter("o_orderkey % 10 <> 9").count()
    assert out.count() == expected
    # bad rows retained with their violation labels
    quarantined = read_quarantine(spark, str(qdir))
    by_label = {
        r["_violations"]: r["n"]
        for r in quarantined.groupBy("_violations").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert by_label.get("unparseable_json") == 2
    assert sum(
        n for lbl, n in by_label.items() if "null_or_empty_value" in lbl
    ) == 1


def test_cli_maintenance_dedup_end_to_end(spark, sf_dir, tmp_path, capsys):
    """r7: --maintenance dedup runs the star-capped MinHash-LSH
    near-duplicate removal over a parquet corpus and keeps exactly the
    canonical member per duplicate cluster."""
    from pyspark.sql import Row

    from cdc_data_lake_pyspark_spark.cli import main

    src, dst = str(tmp_path / "corpus"), str(tmp_path / "deduped")
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [Row(doc_id=i, text=base) for i in range(10)] + [
        Row(doc_id=100 + i, text=f"unique document number {i} with its own distinct words body {i}")
        for i in range(5)
    ]
    spark.createDataFrame(rows).write.parquet(src)
    main(
        [
            "--maintenance", "dedup",
            "--dedup-src", src,
            "--dedup-dst", dst,
            "--dedup-threshold", "0.5",
            "--star-bucket-cap", "4",
            "--catalogtype", "none",
        ]
    )
    kept = {r.doc_id for r in spark.read.parquet(dst).collect()}
    # the 10-member duplicate family collapses to its min id; the 5
    # unique docs survive
    assert kept == {0, 100, 101, 102, 103, 104}
    assert "deduped" in capsys.readouterr().out


def test_print_submit_golden_kafka_iceberg(capsys):
    """r8 (VERDICT r7 #7): --print-submit generates the known-good
    spark-submit recipe for the two environment-gated paths (live Kafka
    source + real Iceberg catalog) without executing anything.  Golden
    text pinned so the recipe cannot drift silently."""
    import pyspark

    from cdc_data_lake_pyspark_spark.cli import iceberg_runtime_line, main

    main(
        [
            "--print-submit",
            "--sourcetype", "kafka",
            "--kafkaserver", "broker1:9092",
            "--topics", "cdc.orders",
            "--catalogtype", "glue",
            "--warehouse", "s3://lake/warehouse",
            "--tablejsonfile", "tables.json",
            "--checkpointpath", "s3://lake/ckpt",
        ]
    )
    out = capsys.readouterr().out
    ver = pyspark.__version__
    mm = ".".join(ver.split(".")[:2])
    kafka_scala = "2.13" if int(ver.split(".")[0]) >= 4 else "2.12"
    ice_line, ice_scala, ice_ver, exact = iceberg_runtime_line(mm)
    # r9 (ADVICE r8): the Iceberg coordinate is validated against the
    # published-artifact map — on a Spark line with no published runtime
    # the recipe substitutes the newest supported line and SAYS SO.
    note = (
        ""
        if exact
        else (
            f"# NOTE: no iceberg-spark-runtime is published for Spark "
            f"{mm}; the coordinate below is the newest supported line "
            f"(Spark {ice_line}, Iceberg {ice_ver}) — run it on a Spark "
            f"{ice_line} cluster, or build Iceberg from source for "
            f"{mm}.\n"
        )
    )
    expected = f"""{note}spark-submit \\
  --deploy-mode cluster \\
  --conf spark.executor.instances=10 \\
  --conf spark.executor.cores=2 \\
  --conf spark.executor.memory=4g \\
  --conf spark.driver.cores=2 \\
  --conf spark.driver.memory=4g \\
  --conf spark.sql.adaptive.enabled=true \\
  --conf spark.sql.shuffle.partitions=64 \\
  --packages org.apache.spark:spark-sql-kafka-0-10_{kafka_scala}:{ver},org.apache.iceberg:iceberg-spark-runtime-{ice_line}_{ice_scala}:{ice_ver},org.apache.iceberg:iceberg-aws-bundle:{ice_ver} \\
  --conf spark.sql.catalog.glue_catalog=org.apache.iceberg.spark.SparkCatalog \\
  --conf spark.sql.catalog.glue_catalog.catalog-impl=org.apache.iceberg.aws.glue.GlueCatalog \\
  --conf spark.sql.catalog.glue_catalog.warehouse=s3://lake/warehouse \\
  --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \\
  cdc_data_lake_pyspark_spark/cli.py \\
  --sourcetype kafka --kafkaserver broker1:9092 --topics cdc.orders --catalogtype glue --warehouse s3://lake/warehouse --tablejsonfile tables.json --checkpointpath s3://lake/ckpt
"""
    assert out == expected


def test_iceberg_runtime_line_map():
    """The coordinate comes from the published-artifact map, not pattern
    derivation: supported lines resolve exactly (with the line's actual
    Scala), unsupported lines (e.g. Spark 4.1) fall back to the newest
    published line with exact=False so the recipe annotates itself."""
    from cdc_data_lake_pyspark_spark.cli import iceberg_runtime_line

    assert iceberg_runtime_line("3.5") == ("3.5", "2.12", "1.10.0", True)
    assert iceberg_runtime_line("4.0") == ("4.0", "2.13", "1.10.0", True)
    line, scala, ver, exact = iceberg_runtime_line("4.1")
    assert (line, scala, ver, exact) == ("4.0", "2.13", "1.10.0", False)


def test_print_submit_file_source_no_packages(capsys):
    """File source + no catalog: no --packages line at all (nothing to
    fetch), and the forwarded argv drops only --print-submit."""
    from cdc_data_lake_pyspark_spark.cli import main

    main(
        [
            "--print-submit",
            "--sourcetype", "file",
            "--source-path", "/data/in",
            "--catalogtype", "none",
            "--sink", "parquet",
            "--sink-root", "/data/out",
            "--tablejsonfile", "tables.json",
            "--checkpointpath", "/data/ckpt",
        ]
    )
    out = capsys.readouterr().out
    assert "--packages" not in out
    assert "--print-submit" not in out.split("cli.py")[1]
    assert "--source-path /data/in" in out
