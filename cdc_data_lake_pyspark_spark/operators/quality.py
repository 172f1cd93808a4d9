"""Data-quality validation: declarative expectations over a table,
reported as one tidy ``(check, violations, total)`` frame.

The Deequ/Great-Expectations pattern reduced to its Spark-first core:
every row-level expectation (not-null, range, custom predicate) is a
conditional-sum column in ONE aggregate pass over the table — at 100 TB
the whole report is a single map-side-combined scan plus one tiny
anti-join per referential check.  No UDFs, no per-check passes.

* :func:`dq_report` — run checks and return the violation counts.
* Gate usage: ``dq_report(...).filter("violations > 0")`` empty ⇒ the
  batch passes; wire it into ``foreachBatch`` ahead of the CDC apply to
  quarantine bad batches.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    checks: Sequence[tuple[str, Column]] = (),
    unique_cols: Sequence[str] = (),
    fk: Optional[tuple[str, str, DataFrame, str]] = None,
) -> DataFrame:
    """Validate ``df`` and return ``(check, violations, total)`` rows.

    ``checks``: ``(name, violation_condition)`` pairs — the condition
    marks a BAD row (e.g. ``F.col("x").isNull()``).  All conditions are
    counted in one aggregate pass.  ``unique_cols`` adds a duplicate-key
    check (``count − count_distinct``).  ``fk=(name, col, dim_df,
    dim_col)`` adds a referential check counting rows whose ``col`` has
    no partner in ``dim_df.dim_col`` (one anti-join against the distinct
    dimension keys — broadcast when small).
    """
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in checks
    ]
    names = [name for name, _ in checks]
    if unique_cols:
        dup_name = "dup_" + "_".join(unique_cols)
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(*unique_cols))
            .cast("long")
            .alias(dup_name)
        )
        names.append(dup_name)
    row = df.agg(
        F.count(F.lit(1)).cast("long").alias("_total"), *aggs
    ).localCheckpoint(eager=False)
    out = row.unpivot(["_total"], names, "check", "violations").select(
        "check", "violations", F.col("_total").alias("total")
    )
    if fk is not None:
        fk_name, col, dim_df, dim_col = fk
        orphans = (
            df.select(F.col(col))
            .join(
                dim_df.select(F.col(dim_col).alias(col)).distinct(),
                col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .crossJoin(row.select("_total"))
            .select(
                F.lit(fk_name).alias("check"),
                "violations",
                F.col("_total").alias("total"),
            )
        )
        out = out.unionByName(orphans)
    return out
