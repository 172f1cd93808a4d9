"""Incremental view maintenance (IVM) for algebraic aggregates.

A CDC lakehouse's most common downstream artifact is an aggregate table
(revenue by status, counts by segment).  Recomputing it from the base
table on every micro-batch re-scans data that did not change; the
incremental encoding folds ONLY the change batch into the existing
aggregate state — the classic delta-propagation rule for algebraic
aggregates (sum/count/avg are self-maintainable: Δstate is a function of
Δrows alone, no base-table access; Gupta & Mumick 1995's terminology).

Contract: the maintained state carries ``n`` (live row count) and one
exact sum per tracked column.  A change batch tags each row ``+1``
(insert / post-image) or ``-1`` (delete / pre-image); an update is its
delete followed by its insert — exactly the Debezium/DMS envelope
semantics the pipeline already routes.  Signed partial sums aggregate
per group (ONE map-side-combined shuffle over the delta, which is tiny
next to the base), then a full-outer join against the state — itself
group-cardinality-sized, not base-sized — merges the two.  Groups whose
count reaches zero are dropped, so state never accumulates dead keys.

At 100 TB this is THE lever for continuous aggregates: per batch the
work is O(|delta| + |groups|) instead of O(|base|), and the state
update is idempotent under replay when driven from the checkpointed
foreachBatch runner (streaming/runner.py) because each batch's delta
aggregates to the same signed partials.

Exactness: counts are BIGINTs and sums ride the DECIMAL(18,2) bridge,
so incremental-vs-recompute equality is bit-exact, not approximate —
the oracle states the recompute and the operator must land on it.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_state(
    base: DataFrame,
    group_cols: list[str],
    sum_cols: Mapping[str, str],
) -> DataFrame:
    """Materialize the aggregate state for ``base``: per group, ``n``
    (row count) plus one exact DECIMAL(18,2) sum per ``sum_cols`` entry
    (source column -> state column name)."""
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.col(src).cast("decimal(18,2)")).alias(dst)
        for src, dst in sum_cols.items()
    ]
    return base.groupBy(*group_cols).agg(*aggs)


def apply_agg_delta(
    state: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: Mapping[str, str],
    sign_col: str = "_sign",
) -> DataFrame:
    """Fold a signed change batch into an aggregate ``state`` frame.

    ``delta`` rows carry ``sign_col`` = +1 (insert) or -1 (delete); an
    update contributes both images.  Returns the updated state with the
    same schema; zero-count groups are dropped.

    One shuffle over the delta (signed partials, map-side combined) +
    one group-keyed full-outer merge with the state.  Neither side is
    base-table-sized.
    """
    partial_aggs = [
        F.sum(F.col(sign_col).cast("bigint")).alias("_dn")
    ] + [
        F.sum(
            F.col(sign_col).cast("decimal(18,2)")
            * F.col(src).cast("decimal(18,2)")
        )
        .cast("decimal(18,2)")
        .alias(f"_d_{dst}")
        for src, dst in sum_cols.items()
    ]
    d = delta.groupBy(*group_cols).agg(*partial_aggs)
    zero = F.lit(0).cast("decimal(18,2)")
    merged = state.join(d, group_cols, "full_outer").select(
        *group_cols,
        (
            F.coalesce(F.col("n"), F.lit(0).cast("bigint"))
            + F.coalesce(F.col("_dn"), F.lit(0).cast("bigint"))
        ).alias("n"),
        *[
            (
                F.coalesce(F.col(dst), zero)
                + F.coalesce(F.col(f"_d_{dst}"), zero)
            )
            .cast("decimal(18,2)")
            .alias(dst)
            for dst in sum_cols.values()
        ],
    )
    return merged.filter(F.col("n") > 0)
