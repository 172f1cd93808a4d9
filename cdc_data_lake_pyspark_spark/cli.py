"""One CLI entry point replacing the reference's six entry scripts.

The reference wraps a single logical pipeline in six thin AWS-bound scripts
(SURVEY §3 takeaway); this CLI exposes the same argument surface once —
flag names follow ``kafka-iceberg-streaming-emrserverless-v2.py:56-115``
(``--jobname --starting_offsets_of_kafka_topic --topics --icebergdb
--warehouse --tablejsonfile --region --kafkaserver --checkpointpath
--sourcetype --cdcformat --catalogtype --catalogname``) plus local-run
additions (``--source file`` with ``--source-path``, ``--sink
parquet|memory`` with ``--sink-root``) so the pipeline runs without AWS.

Catalog wiring mirrors the reference's session config (``:133-149``) using
public Iceberg-on-Spark configuration:

* glue: ``org.apache.iceberg.aws.glue.GlueCatalog`` + warehouse
* s3table: ``software.amazon.s3tables.iceberg.S3TablesCatalog`` + bucket ARN
  (``kafka-iceberg-streaming-emrserverless-s3table.py:123-131``)
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

from cdc_data_lake_pyspark_spark.apply import (
    ParquetTableSink,
    SqlTableSink,
    TableSink,
)
from cdc_data_lake_pyspark_spark.pipeline import CdcPipeline
from cdc_data_lake_pyspark_spark.session import build_session
from cdc_data_lake_pyspark_spark.sources.files import read_json_lines_stream
from cdc_data_lake_pyspark_spark.sources.kafka import (
    kafka_source_options,
    read_kafka_stream,
)
from cdc_data_lake_pyspark_spark.streaming.runner import start_cdc_stream


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cdc_data_lake_pyspark_spark",
        description="CDC (Debezium/DMS) Kafka -> lakehouse streaming apply",
    )
    # reference argument surface (emrserverless-v2.py:56-115)
    p.add_argument("--jobname", default="cdc-data-lake")
    p.add_argument(
        "--starting_offsets_of_kafka_topic",
        dest="starting_offsets",
        default="latest",
        help="earliest|latest, or an epoch-millis timestamp (digit string "
        "switches to startingTimestamp, as in the reference :187-190)",
    )
    p.add_argument("--topics", help="comma-separated Kafka topics")
    p.add_argument("--icebergdb", help="target database (catalog sinks)")
    p.add_argument("--warehouse", help="warehouse path / bucket ARN")
    p.add_argument("--tablejsonfile", help="tables.json path (required for streaming)")
    p.add_argument("--region", help="AWS region (catalog sinks; unused locally)")
    p.add_argument("--kafkaserver", help="bootstrap servers")
    p.add_argument("--checkpointpath", help="(required for streaming)")
    p.add_argument("--sourcetype", choices=["kafka", "file"], default="kafka")
    p.add_argument("--cdcformat", choices=["debezium", "dms"], default="debezium")
    p.add_argument(
        "--catalogtype", choices=["glue", "s3table", "none"], default="none"
    )
    p.add_argument("--catalogname", default="glue_catalog")
    # local-run additions
    p.add_argument("--source-path", help="JSON-lines dir for --sourcetype file")
    p.add_argument(
        "--sink",
        choices=["iceberg", "locallake", "parquet", "memory"],
        default=None,
    )
    p.add_argument("--sink-root", help="root dir for the parquet sink")
    p.add_argument("--trigger-seconds", type=int, default=60)
    p.add_argument(
        "--available-now",
        action="store_true",
        help="drain what's available, then stop (backfill/testing)",
    )
    p.add_argument(
        "--quarantine",
        help="dead-letter dir: rows with missing/blank or unparseable "
        "JSON envelopes append here (stamped with check name + batch "
        "id) while clean rows apply — J3 log-and-continue with data "
        "retention instead of loss",
    )
    p.add_argument(
        "--ts-guard",
        default=None,
        help="column name enabling the cross-batch out-of-order merge guard",
    )
    p.add_argument(
        "--max-parallel-tables",
        type=int,
        default=8,
        help="tables applied concurrently per batch (1 = sequential)",
    )
    # table-maintenance mode (no streaming): OPTIMIZE-style compaction /
    # corpus near-duplicate removal
    p.add_argument(
        "--maintenance",
        choices=["compact", "dedup"],
        help="run a maintenance task instead of the streaming pipeline",
    )
    p.add_argument("--compact-src", help="parquet dir to compact")
    p.add_argument("--compact-dst", help="output dir for packed files")
    p.add_argument(
        "--compact-target-mb",
        type=int,
        default=128,
        help="target output file size (MiB)",
    )
    p.add_argument(
        "--compact-sort-cols",
        help="comma-separated columns to range-sort during the rewrite "
        "(restores min/max locality)",
    )
    # --maintenance dedup: MinHash-LSH near-duplicate removal over a
    # parquet corpus (keep the canonical member per duplicate cluster)
    p.add_argument("--dedup-src", help="parquet corpus dir to deduplicate")
    p.add_argument("--dedup-dst", help="output dir for the deduped corpus")
    p.add_argument("--dedup-id-col", default="doc_id")
    p.add_argument("--dedup-text-col", default="text")
    p.add_argument(
        "--dedup-threshold",
        type=float,
        default=0.8,
        help="Jaccard threshold for near-duplicate pairs",
    )
    p.add_argument(
        "--star-bucket-cap",
        default="auto",
        help="hot-LSH-bucket bound: 'auto' (default, "
        "operators.dedup_text.DEFAULT_STAR_BUCKET_CAP), 'none' "
        "(unconditional all-pairs verification — quadratic in hot "
        "duplicate families), or an integer cap",
    )
    p.add_argument(
        "--print-submit",
        action="store_true",
        help="print (do not execute) the spark-submit command line that "
        "runs THIS invocation on a real cluster — Kafka connector + "
        "Iceberg catalog packages/confs included per the chosen "
        "--sourcetype/--catalogtype — then exit",
    )
    return p


#: Spark lines for which an ``iceberg-spark-runtime`` artifact is
#: actually published on Maven Central, mapped to (Scala binary version
#: of the prebuilt Spark distribution for that line, newest Iceberg
#: release shipping that runtime) — per the iceberg.apache.org
#: multi-engine-support matrix.  NOT every PySpark version has a
#: matching runtime (ADVICE r8): pattern-deriving the coordinate from
#: ``pyspark.__version__`` alone yields nonexistent artifacts on new
#: Spark lines (e.g. 4.1) and the wrong Scala suffix on 2.12-built
#: Spark 3.x clusters, so the recipe is validated against this map and
#: falls back — loudly, with a NOTE in the emitted text — to the newest
#: supported line when the installed Spark has no published runtime.
ICEBERG_RUNTIMES = {
    "3.4": ("2.12", "1.8.1"),
    "3.5": ("2.12", "1.10.0"),
    "4.0": ("2.13", "1.10.0"),
}

#: newest Iceberg release the map knows about (kept for test pins / docs)
ICEBERG_VERSION = "1.10.0"


def iceberg_runtime_line(major_minor: str):
    """``(spark_line, scala, iceberg_version, exact)`` for the newest
    published Iceberg runtime usable from this Spark line.  ``exact`` is
    False when the installed line has no published runtime and the
    newest supported line is substituted (the caller annotates)."""
    if major_minor in ICEBERG_RUNTIMES:
        scala, ice = ICEBERG_RUNTIMES[major_minor]
        return major_minor, scala, ice, True
    newest = max(ICEBERG_RUNTIMES, key=lambda mm: tuple(map(int, mm.split("."))))
    scala, ice = ICEBERG_RUNTIMES[newest]
    return newest, scala, ice, False


def build_submit_command(args, argv: Sequence[str]) -> str:
    """The spark-submit line for this CLI invocation on a real cluster.

    Package coordinates are derived from the installed PySpark version
    (the cluster must match it): the Kafka DSv2 connector ships as
    ``org.apache.spark:spark-sql-kafka-0-10`` at exactly the Spark
    version (Scala suffix per the prebuilt distribution's Scala), and
    Iceberg via :data:`ICEBERG_RUNTIMES` — validated against the
    published-artifact matrix rather than pattern-derived, with a NOTE
    emitted when the installed Spark line has no published runtime.
    Catalog --conf lines are THE SAME ``catalog_session_conf`` dict the
    local session builder applies, so the printed command and a local
    ``--sink locallake`` run configure the session identically — only
    the catalog implementation differs.  Executor sizing mirrors the
    reference deployment (10 executors x 2 cores x 4 GB; see
    BASELINE.md "EMR compute") as a starting point, not a tuning claim.
    """
    import pyspark

    ver = pyspark.__version__
    major_minor = ".".join(ver.split(".")[:2])
    # Scala binary version of the prebuilt Spark distributions: 4.x ships
    # 2.13 only; the stock 3.x downloads are 2.12 builds (ADVICE r8 — a
    # hardcoded 2.13 named the wrong Kafka connector on 3.x clusters).
    kafka_scala = "2.13" if int(ver.split(".")[0]) >= 4 else "2.12"
    notes = []
    pkgs = []
    if args.sourcetype == "kafka":
        pkgs.append(f"org.apache.spark:spark-sql-kafka-0-10_{kafka_scala}:{ver}")
    if args.catalogtype != "none":
        ice_line, ice_scala, ice_ver, exact = iceberg_runtime_line(major_minor)
        if not exact:
            notes.append(
                f"# NOTE: no iceberg-spark-runtime is published for Spark "
                f"{major_minor}; the coordinate below is the newest "
                f"supported line (Spark {ice_line}, Iceberg {ice_ver}) — "
                f"run it on a Spark {ice_line} cluster, or build Iceberg "
                f"from source for {major_minor}."
            )
        pkgs.append(
            "org.apache.iceberg:iceberg-spark-runtime-"
            f"{ice_line}_{ice_scala}:{ice_ver}"
        )
        pkgs.append(f"org.apache.iceberg:iceberg-aws-bundle:{ice_ver}")
        if args.catalogtype == "s3table":
            pkgs.append(
                "software.amazon.s3tables:"
                "s3-tables-catalog-for-iceberg-runtime:0.1.7"
            )
    lines = notes + [
        "spark-submit \\",
        "  --deploy-mode cluster \\",
        "  --conf spark.executor.instances=10 \\",
        "  --conf spark.executor.cores=2 \\",
        "  --conf spark.executor.memory=4g \\",
        "  --conf spark.driver.cores=2 \\",
        "  --conf spark.driver.memory=4g \\",
        "  --conf spark.sql.adaptive.enabled=true \\",
        "  --conf spark.sql.shuffle.partitions=64 \\",
    ]
    if pkgs:
        lines.append(f"  --packages {','.join(pkgs)} \\")
    for key, val in sorted(catalog_session_conf(args).items()):
        lines.append(f"  --conf {key}={val} \\")
    fwd = [a for a in argv if a != "--print-submit"]
    lines.append("  cdc_data_lake_pyspark_spark/cli.py \\")
    lines.append("  " + " ".join(fwd))
    return "\n".join(lines)


def run_maintenance(spark, args) -> None:
    if args.maintenance == "dedup":
        run_dedup_maintenance(spark, args)
        return
    if not (args.compact_src and args.compact_dst):
        raise SystemExit(
            "--compact-src and --compact-dst are required for "
            "--maintenance compact"
        )
    from cdc_data_lake_pyspark_spark.operators.layout import compact_files

    n = compact_files(
        spark,
        args.compact_src,
        args.compact_dst,
        target_bytes=args.compact_target_mb * 1024 * 1024,
        sort_cols=(
            args.compact_sort_cols.split(",") if args.compact_sort_cols else ()
        ),
    )
    print(f"compacted {args.compact_src} -> {args.compact_dst} ({n} files)")


def run_dedup_maintenance(spark, args) -> None:
    """Near-duplicate corpus maintenance: MinHash → LSH (star-capped by
    default) → exact-Jaccard verify → keep the canonical member per
    duplicate cluster, written as parquet."""
    if not (args.dedup_src and args.dedup_dst):
        raise SystemExit(
            "--dedup-src and --dedup-dst are required for "
            "--maintenance dedup"
        )
    cap = args.star_bucket_cap
    if isinstance(cap, str):
        cap = None if cap.lower() == "none" else (
            "auto" if cap.lower() == "auto" else int(cap)
        )
    from cdc_data_lake_pyspark_spark.operators.clusters import (
        dedup_keep_canonical,
    )
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        minhash_near_duplicates,
    )

    docs = spark.read.parquet(args.dedup_src)
    pairs = minhash_near_duplicates(
        docs,
        threshold=args.dedup_threshold,
        id_col=args.dedup_id_col,
        text_col=args.dedup_text_col,
        star_bucket_cap=cap,
    )
    kept = dedup_keep_canonical(docs, pairs, id_col=args.dedup_id_col)
    kept.write.mode("overwrite").parquet(args.dedup_dst)
    n_in = docs.count()
    n_out = spark.read.parquet(args.dedup_dst).count()
    print(
        f"deduped {args.dedup_src} -> {args.dedup_dst} "
        f"({n_in} docs in, {n_out} kept, cap={cap})"
    )


def catalog_session_conf(args) -> dict[str, str]:
    """Iceberg catalog wiring (public Spark/Iceberg config keys only)."""
    if args.catalogtype == "none":
        return {}
    name = args.catalogname
    conf = {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{name}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{name}.warehouse": args.warehouse or "",
    }
    if args.catalogtype == "glue":
        conf[f"spark.sql.catalog.{name}.catalog-impl"] = (
            "org.apache.iceberg.aws.glue.GlueCatalog"
        )
    elif args.catalogtype == "s3table":
        conf[f"spark.sql.catalog.{name}.catalog-impl"] = (
            "software.amazon.s3tables.iceberg.S3TablesCatalog"
        )
    return conf


def make_sink(args, spark=None) -> TableSink:
    sink = args.sink or ("iceberg" if args.catalogtype != "none" else "parquet")
    if sink == "iceberg":
        return SqlTableSink(catalog=args.catalogname)
    if sink == "locallake":
        # executed-SQL path without a lakehouse runtime: register the
        # in-process DSv2 catalog and drive it with the same SqlTableSink
        # that targets Iceberg/Delta in production
        from cdc_data_lake_pyspark_spark.catalog import register

        register(spark, "locallake")
        return SqlTableSink(catalog="locallake")
    if sink == "parquet":
        if not args.sink_root:
            raise SystemExit("--sink-root is required for the parquet sink")
        return ParquetTableSink(args.sink_root)
    from cdc_data_lake_pyspark_spark.apply import MemoryTableSink

    return MemoryTableSink()


def make_source(spark, args):
    if args.sourcetype == "file":
        if not args.source_path:
            raise SystemExit("--source-path is required for --sourcetype file")
        return read_json_lines_stream(spark, args.source_path)
    if not (args.kafkaserver and args.topics):
        raise SystemExit("--kafkaserver and --topics are required for kafka")
    so = args.starting_offsets
    opts = kafka_source_options(
        bootstrap_servers=args.kafkaserver,
        topics=args.topics,
        starting_offsets=so if not so.isdigit() else "latest",
        starting_timestamp=int(so) if so.isdigit() else None,
    )
    return read_kafka_stream(spark, opts)


def main(argv: Optional[Sequence[str]] = None) -> None:
    if argv is None:
        import sys

        argv = sys.argv[1:]
    argv = list(argv)
    args = build_arg_parser().parse_args(argv)
    if args.print_submit:
        print(build_submit_command(args, argv))
        return
    spark = build_session(
        app_name=args.jobname, extra_conf=catalog_session_conf(args)
    )
    if args.maintenance:
        run_maintenance(spark, args)
        return
    if not (args.tablejsonfile and args.checkpointpath):
        raise SystemExit(
            "--tablejsonfile and --checkpointpath are required for the "
            "streaming pipeline"
        )
    pipeline = CdcPipeline(
        config=args.tablejsonfile,
        sink=make_sink(args, spark),
        cdc_format=args.cdcformat,
        ts_guard=args.ts_guard,
        max_parallel_tables=args.max_parallel_tables,
    )
    query = start_cdc_stream(
        source=make_source(spark, args),
        pipeline=pipeline,
        checkpoint_location=args.checkpointpath,
        trigger_seconds=args.trigger_seconds,
        query_name=args.jobname,
        available_now=args.available_now,
        quarantine_dir=args.quarantine,
    )
    query.awaitTermination()


if __name__ == "__main__":
    main()
