"""Payload schema inference, alignment, and timestamp casting (SURVEY §1.2-1.3).

Reference parity:

* payload schema inferred at runtime with ``schema_of_json`` on the FIRST
  row of each table's slice (``transaction_log_util.py:104-105,164-166``;
  DMS ``transcation_log_dms.py:170-171,202-203,236-238``);
* upsert path instead reads the authoritative sink schema after ``REFRESH
  TABLE`` (``transaction_log_util.py:138-145``) to keep MERGE column
  order/types aligned;
* configured ``timestamp.fields`` string columns cast with
  ``to_timestamp()`` before writing (``transaction_log_util.py:195-200,
  248-253``).

Scale fix vs the reference (SURVEY §4.2.2): first-row-only inference types
null-in-sample columns wrong.  :func:`infer_json_schema` defaults to
inference over the WHOLE slice using Spark's distributed JSON reader
(one extra pass over the cached batch, executed in parallel), with a
``sample_rows`` knob for very large batches.  First-row behavior is still
available (``sample_rows=1`` collects driver-side like the reference).
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def infer_json_schema(
    df: DataFrame,
    json_col: str,
    sample_rows: Optional[int] = None,
) -> T.StructType:
    """Infer the payload schema of a JSON-string column.

    ``sample_rows=None`` (default): distributed inference over every row of
    the slice via ``spark.read.json`` — null-in-first-row columns still get
    a type from other rows, and conflicting primitive types widen to string,
    matching Spark's standard JSON inference.

    ``sample_rows=N``: limit the scan to N rows first (N=1 reproduces the
    reference's first-row behavior, ``transaction_log_util.py:104-105``).

    The scan stays entirely JVM-side: the string column is handed to the
    JVM ``DataFrameReader.json(Dataset<String>)`` overload through py4j, so
    inference is a distributed JVM job — no pickling of every row through
    Python the way ``spark.read.json(df.rdd.map(...))`` would.
    """
    spark = df.sparkSession
    strings = df.select(F.col(json_col).cast("string").alias("value")).filter(
        F.col("value").isNotNull()
    )
    if sample_rows is not None:
        strings = strings.limit(sample_rows)
    try:
        jvm = spark._jvm
        jds = getattr(strings._jdf, "as")(jvm.org.apache.spark.sql.Encoders.STRING())
        jschema = spark._jsparkSession.read().json(jds).schema()
        return T.StructType.fromJson(__import__("json").loads(jschema.json()))
    except Exception:  # pragma: no cover - connect mode / API drift
        rdd = strings.rdd.map(lambda r: r["value"])
        return spark.read.json(rdd).schema


def infer_and_parse_json(
    df: DataFrame, json_col: str, keep_cols: Iterable[str] = ()
) -> DataFrame:
    """Distributed infer+parse in ONE pass: the JVM ``read.json`` job that
    infers the schema already produces the parsed frame — return it instead
    of re-parsing with ``from_json`` (halves the JSON work vs infer + parse
    as separate passes).

    ``keep_cols`` (envelope columns such as ``ts_ms``) ride along INSIDE
    the single pass: each row is wrapped as ``{"k": <to_json(keep)>,
    "d": <payload>}`` with a cheap codegen'd string concat, so the one JSON
    job infers and decodes payload AND carried columns together — no
    second scan, no join.  Output columns: keep_cols first, then payload
    fields in Spark's JSON-inference (lexicographic) order — identical to
    ``parse_payload`` with the schema from :func:`infer_json_schema`.
    """
    from pyspark.sql import DataFrame as PyDataFrame

    keep_cols = list(keep_cols)
    spark = df.sparkSession
    if keep_cols:
        # to_json is staged in its own projection so CollapseProject can't
        # duplicate the (codegen-fallback) expression per consumer
        wrapped = df.select(
            F.to_json(F.struct(*[F.col(c) for c in keep_cols])).alias("_k"),
            F.col(json_col).cast("string").alias("_d"),
        )
        # a null payload nulls the whole concat, so one filter covers both
        strings = wrapped.select(
            F.concat(
                F.lit('{"k":'), F.col("_k"), F.lit(',"d":'), F.col("_d"), F.lit("}")
            ).alias("value")
        ).filter(F.col("value").isNotNull())
    else:
        strings = df.select(F.col(json_col).cast("string").alias("value")).filter(
            F.col("value").isNotNull()
        )
    try:
        jvm = spark._jvm
        jds = getattr(strings._jdf, "as")(jvm.org.apache.spark.sql.Encoders.STRING())
        jdf = PyDataFrame(spark._jsparkSession.read().json(jds), spark)
    except Exception:  # pragma: no cover - connect mode / API drift
        schema = infer_json_schema(strings, "value")
        jdf = parse_payload(strings, "value", schema)
    if not keep_cols:
        return jdf
    return jdf.select(
        *[F.col(f"k.{c}").alias(c) for c in keep_cols], F.col("d.*")
    )


def parse_payload(
    df: DataFrame,
    json_col: str,
    schema: T.StructType,
    keep_cols: Iterable[str] = (),
) -> DataFrame:
    """``from_json`` the payload column and flatten it (P4+P5: reference's
    ``from_json(col('after'), schema)`` + ``select('data.*')``,
    ``transaction_log_util.py:110,145,167``)."""
    parsed = df.withColumn("_data", F.from_json(F.col(json_col), schema))
    cols = [F.col(c) for c in keep_cols] + [F.col("_data.*")]
    return parsed.select(*cols)


def cast_timestamp_fields(df: DataFrame, fields: Iterable[str]) -> DataFrame:
    """Cast configured string columns to timestamp (P9: reference's
    ``withColumn(c, to_timestamp(col(c)))``, ``transaction_log_util.py:
    195-200``). Missing fields are skipped, matching the reference's
    membership check."""
    out = df
    for c in fields:
        if c in out.columns:
            out = out.withColumn(c, F.to_timestamp(F.col(c)))
    return out


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project/cast ``df`` to the target schema's column order and types —
    the upsert path's catalog-schema alignment (``transaction_log_util.py:
    138-145``). Columns absent from ``df`` become typed nulls; extra
    columns are kept AFTER the target's (schema evolution: new CDC columns
    flow through so sinks with ``merge-schema`` pick them up)."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            # try_cast: a malformed value becomes null instead of failing
            # the batch under ANSI mode — matching from_json's leniency
            # when parsing directly against the target type
            cols.append(F.col(f.name).try_cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    target_names = {f.name for f in target.fields}
    extras = [F.col(f.name) for f in df.schema.fields if f.name not in target_names]
    return df.select(*cols, *extras)


def merge_schemas(base: T.StructType, incoming: T.StructType) -> T.StructType:
    """Evolution policy: base columns keep their type; new incoming columns
    are appended (the sink-side effect of Iceberg's ``merge-schema`` write
    option, ``transaction_log_util.py:216-218``)."""
    names = {f.name for f in base.fields}
    fields = list(base.fields) + [f for f in incoming.fields if f.name not in names]
    return T.StructType(fields)
