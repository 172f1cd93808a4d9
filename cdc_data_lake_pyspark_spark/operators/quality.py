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
* :func:`mad_outliers` — robust per-group outlier detection (median /
  MAD modified z-score, Iglewicz & Hoaglin 1993), the anomaly gate that
  survives the heavy-tailed value distributions where mean/stddev
  z-scores drown.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
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
    ).localCheckpoint(eager=True)
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

def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    threshold: float = 3.5,
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group robust outliers by modified z-score:
    ``z = 0.6745 * (x - median) / MAD`` with ``MAD = median(|x -
    median|)``; rows with ``|z| > threshold`` (3.5 is Iglewicz &
    Hoaglin's recommendation) are returned with their group statistics.

    Why median/MAD and not mean/stddev: one colossal value inflates the
    stddev enough to hide every other anomaly; the breakdown point of
    the median is 50%, so the gate keeps working on exactly the
    batch-gone-wrong data it exists to catch.  Groups whose MAD is 0 (over half
    the group identical) are excluded — the score is undefined there.

    Determinism: both "medians" are DISCRETE rank selections (the value
    at rank ``ceil(0.5·n)`` in sorted order — an actual data point),
    the same engine-portable convention as
    ``segment_price_percentiles``: interpolating ``percentile_cont``
    differs across engines in the last ulp, rank selection cannot.  The
    score arithmetic is then scalar IEEE ops on identical inputs —
    bit-reproducible, no rounding bridge needed.

    Scale: two sort-shuffle passes over the fact table (the median
    window, then the deviation-median window) plus one final scoring
    join — all partitioned on ``group_cols``; per-group sorts are
    Spark's spillable external sort, and at extreme per-group
    cardinality the documented degrade is ``percentile_approx`` with
    the same three-stage shape.
    """

    def _rank_median(frame: DataFrame, col: Column, out: str) -> DataFrame:
        w = Window.partitionBy(*gcols).orderBy(col.asc())
        ranked = frame.select(
            *gcols,
            col.alias("_v"),
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(Window.partitionBy(*gcols)).alias("_n"),
        )
        return ranked.groupBy(*gcols).agg(
            F.max(
                F.when(
                    F.col("_rn")
                    == F.ceil(F.lit(0.5) * F.col("_n")).cast("long"),
                    F.col("_v"),
                )
            ).alias(out)
        )

    gcols = list(group_cols)
    x = F.col(value_col).cast("double")
    med = _rank_median(df, x, "_med")
    mad = _rank_median(
        df.join(med, gcols), F.abs(x - F.col("_med")), "_mad"
    )
    z = F.lit(0.6745) * (x - F.col("_med")) / F.col("_mad")
    out_cols = [*(id_cols or []), *gcols]
    return (
        df.join(med, gcols)
        .join(mad, gcols)
        .filter(F.col("_mad") > 0)
        .withColumn("robust_z", z)
        .filter(F.abs(F.col("robust_z")) > F.lit(threshold))
        .select(
            *out_cols,
            x.alias("value"),
            F.col("_med").alias("group_median"),
            F.col("_mad").alias("group_mad"),
            "robust_z",
        )
    )
