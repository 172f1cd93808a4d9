"""Data layout for scan efficiency: partitioned writes, within-partition
sort for min/max skipping, and Z-order (Morton) clustering keys.

At 100 TB the fastest query is the one that never reads the data: layout
is the write-side half of predicate pushdown.

* :func:`write_partitioned` — hive-style directory partitioning (coarse
  pruning: equality/IN predicates on partition columns skip whole
  directories at planning time) plus a within-partition sort so parquet
  row-group min/max statistics prune at the finer grain.
* :func:`morton_key` — interleaves the bits of two normalized columns so
  ONE sort key clusters BOTH dimensions: range predicates on either
  column map to bounded Morton ranges, keeping row-group min/max windows
  tight for two-column workloads (the classic Z-order layout Delta's
  OPTIMIZE ZORDER applies; here it's an explicit column any writer can
  sort by).  Pure JVM bit arithmetic — no UDF.
* :func:`write_bucketed` — hash-bucketed tables: two tables bucketed by
  the same key into the same bucket count join WITHOUT a shuffle (and,
  sorted, without a sort) — the pre-paid join.  At 100 TB this is THE
  lever for a fact table joined repeatedly on one key: the shuffle is
  paid once at write time, then every join/aggregation on the bucket
  key is exchange-free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative integer columns
    into a single Z-order key (a's bits at even positions).

    Callers normalize each dimension into [0, 2^bits) first — e.g. rank,
    bucketed timestamp, or quantized value.  2·bits ≤ 62 keeps the result
    in a BIGINT.
    """
    if 2 * bits > 62:
        raise ValueError("2*bits must fit in a signed 64-bit integer")
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        key = (
            key
            .bitwiseOR(F.shiftleft(abit, 2 * i))
            .bitwiseOR(F.shiftleft(bbit, 2 * i + 1))
        )
    return key


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet with an optional within-partition
    sort.

    ``repartition(partition_cols)`` first, so each output directory is
    written by the tasks that own its keys (no small-file explosion from
    every task writing every partition); ``sortWithinPartitions`` then
    lines up row-group min/max stats along ``sort_cols`` for skipping.
    """
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(
            *[F.col(c) for c in list(partition_cols) + list(sort_cols)]
        )
    out.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a hash-bucketed (optionally bucket-sorted) managed
    table.

    Joins and aggregations keyed on ``bucket_col`` between tables that
    share the bucket count then plan with NO Exchange — Catalyst proves
    the child output partitioning already satisfies the join
    distribution — and with ``sort=True`` the sort-merge join's sorts
    disappear too (pinned by ``tests/test_layout.py``, which asserts the
    exchange-free plan against the shuffling plan the same join gets on
    plain parquet).  Bucket counts must match across join sides; pick a
    count divisible by the cluster's parallelism and keep it stable
    across daily writes so co-location persists."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def compact_files(
    spark,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] = (),
) -> int:
    """OPTIMIZE-style small-file compaction: rewrite a parquet directory
    into files sized near ``target_bytes``.  Returns the output file
    count.

    Streaming CDC sinks write one file per (micro-batch × partition) —
    at a 30 s trigger that is ~3k files/day/table, and at 100 TB the
    scan's task-scheduling and footer-reading overhead comes to dominate
    (the classic lakehouse small-file problem; Delta's OPTIMIZE and
    Iceberg's rewrite_data_files exist for exactly this).  The rewrite:
    size the output from the ACTUAL on-disk bytes of the input files
    (``df.inputFiles()`` — the same listing the scan uses), then one
    round-robin repartition to ``ceil(bytes / target)`` writers.  With
    ``sort_cols`` the rewrite also re-clusters rows (compaction is the
    natural moment to restore min/max locality lost to incremental
    appends) — then the repartition is range-based on those columns so
    files tile the sort domain.

    Local paths size via the filesystem; on a real cluster the same
    listing comes from the table format's manifest (file sizes are
    already in Iceberg/Delta metadata — no extra I/O).
    """
    import math
    import os
    from urllib.parse import urlparse

    df = spark.read.parquet(path)
    files = df.inputFiles()
    total = 0
    n_sized = 0
    for f in files:
        local = urlparse(f).path or f
        try:
            total += os.path.getsize(local)
            n_sized += 1
        except OSError:
            pass  # non-local / unstat-able URI
    n_in = len(files)
    if n_sized == n_in and total:
        sized_total = total
    elif n_sized:
        # A mix of local and unstat-able inputs: extrapolate the missing
        # files from the sized files' mean instead of silently
        # undersizing n_out (which would pack everything into far
        # fewer/larger files than target_bytes intends).
        sized_total = math.ceil(total * n_in / n_sized)
    else:
        sized_total = 0
    n_out = max(1, math.ceil(sized_total / target_bytes)) if sized_total else n_in
    if sort_cols:
        out = df.repartitionByRange(
            n_out, *[F.col(c) for c in sort_cols]
        ).sortWithinPartitions(*[F.col(c) for c in sort_cols])
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(out_path)
    return n_out
