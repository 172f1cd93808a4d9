"""Relational operators a training-data pipeline leans on beyond the
reference's CDC surface: gap sessionization, as-of joins, deterministic
hash splits, and quantile bucketing.

All four are pure DataFrame compositions (no UDFs, no driver collects) and
each has an exact ANSI-SQL oracle (registered in queries_phase3.py).

Scale notes per operator in the docstrings; the common theme: one shuffle
on the natural key, window functions over per-key partitions, everything
codegen'd.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: events of one key belong to the same
    session while consecutive gaps stay under ``gap``.

    Adds ``session_seq`` (1-based per-key session index) — the classic
    lag → new-session flag → running-sum composition.  ONE shuffle (hash
    by key); both windows share the same partitioning so Spark plans a
    single exchange + sort.  At 100 TB this is the canonical layout:
    sessions never span keys, so per-key partitions parallelize freely.
    ``id_col`` breaks timestamp ties deterministically.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap_expr), 1
    ).otherwise(0)
    return events.withColumn("_new", new_session).withColumn(
        "session_seq", F.sum("_new").over(w)
    ).drop("_new")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """As-of join: each left row picks the LATEST right row with the same
    key and ``right_ts <= left_ts`` (the time-series/price-lookup shape;
    DuckDB spells it ``ASOF JOIN``).

    Spark-first: NOT a range join (which explodes to O(matches) pairs and
    re-filters) — the union-and-window trick:

      union both sides tagged → one window per key ordered by (ts, side)
      → ``last_value(right payload, ignoreNulls)`` carries the most recent
      right row forward → keep left rows.

    ONE shuffle of left+right on the key, one sort, no join at all; ties
    (right_ts == left_ts) match because right rows sort BEFORE left rows
    at equal timestamps.  Left rows with no prior right row keep nulls
    (LEFT OUTER ASOF semantics).
    """
    right_cols = list(right_cols or [c for c in right.columns if c not in (right_key, right_ts)])
    lcols = [c for c in left.columns]

    tagged_left = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    tagged_right = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    both = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in right_cols
        ],
        F.last(F.col("_r_ts"), ignorenulls=True).over(w).alias("_c_ts"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_c_{c}").alias(c) for c in right_cols],
        F.col("_c_ts").alias("asof_ts"),
    )


def portable_id_hash(col: Column) -> Column:
    """60-bit deterministic hash of any value, identical in DuckDB: parse
    the first 15 hex chars of ``md5(cast(x as string))``.  The portable
    cousin of ``xxhash64`` for split/sample decisions that must be
    reproducible outside the JVM."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Sequence[int] = (80, 10, 10),
    names: Sequence[str] = ("train", "val", "test"),
) -> DataFrame:
    """Deterministic train/val/test assignment: ``split`` column derived
    from a portable hash of the id — stable across runs, engines, and
    cluster layouts (unlike ``randomSplit``, which depends on partitioning).

    Map-only: no shuffle, no state; at 100 TB each task decides its rows
    independently, and adding data never reassigns existing ids.
    """
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    total = sum(weights)
    bucket = F.pmod(portable_id_hash(F.col(id_col)), F.lit(total))
    expr = None
    acc = 0
    for w, name in zip(weights, names):
        acc += w
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    partition_cols: Sequence[str] = (),
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact quantile bucketing (``ntile``) with a deterministic tiebreak
    on ``id_col`` — e.g. quality-score deciles per language for curriculum
    mixing.  One shuffle on the partition columns; the per-partition sort
    is the unavoidable cost of exact quantiles (approx alternatives:
    ``approxQuantile`` driver-side, not oracle-stable)."""
    w = Window.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    return df.withColumn("bucket", F.ntile(n_buckets).over(w))


def ranked_topk(
    df: DataFrame, order: Sequence[Column], k: int, rank_col: str = "rank"
) -> DataFrame:
    """Global top-``k`` with a ``row_number`` rank column and NO
    unpartitioned window over the INPUT: ``orderBy().limit(k)`` plans a
    TakeOrderedAndProject (per-partition ``k``-row heaps merged on the
    driver), and only THEN does ``row_number() OVER (ORDER BY ...)`` run —
    the single-partition window moves exactly ``k`` rows, so it is
    scale-safe and contract-guaranteed (no reliance on partition-index or
    id-contiguity implementation details).  Applying the window BEFORE the
    limit — ``row_number()`` over the raw input — would move the ENTIRE
    input to one partition; at corpus scale that is the plan-killer this
    helper exists to avoid.

    ``order`` must be a deterministic total order (include a unique
    tiebreak column) or ranks are not reproducible.
    """
    order = list(order)
    w = Window.orderBy(*order)
    return (
        df.orderBy(*order)
        .limit(k)
        .withColumn(rank_col, F.row_number().over(w).cast("int"))
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Interval / range join: pair each left row with every right row of
    the same key whose timestamp falls in the half-open window
    ``[left_ts + lower_s, left_ts + upper_s)`` (seconds).

    Spark plans a key-equi join with a residual time predicate as a sort
    merge join on the key alone — fine — but a PURE range join (or a hot
    key) degenerates to comparing every in-key pair.  The scale path used
    here is the standard bucketed rewrite: with bucket width
    ``w = upper_s - lower_s``, a left row's window overlaps at most two
    width-``w`` epoch buckets and a right row lives in exactly one, so

      left  → explode to its (<= 2) covering bucket ids
      right → single bucket id
      equi-join on (key, bucket) → exact residual filter

    turns the non-equi join into a plain hash/sort-merge equi join whose
    candidate set is bounded by per-(key, bucket) density, not per-key
    density.  No pair can match in two buckets (the right row has one
    bucket), so no dedup pass is needed.  One shuffle per side on
    (key, bucket); AQE handles residual skew.

    Column names of ``left`` and ``right`` must be disjoint.
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"overlapping column names: {sorted(overlap)}")
    # Microsecond arithmetic throughout: the residual filter must compare
    # full-precision instants (second-floored comparisons silently widen
    # the window for sub-second timestamps), and with bucket width equal
    # to the exact half-open window length every left window covers at
    # most two buckets.
    w = (upper_s - lower_s) * 1_000_000
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    lo = l_us + F.lit(lower_s * 1_000_000)
    hi = l_us + F.lit(upper_s * 1_000_000)
    lhs = left.select(
        "*",
        lo.alias("_lo"),
        hi.alias("_hi"),
        F.explode(
            F.sequence(F.floor(lo / w), F.floor((hi - 1) / w))
        ).alias("_bkt"),
    )
    rhs = right.select(
        "*", r_us.alias("_rs"), F.floor(r_us / w).alias("_bkt")
    )
    cond = (
        (lhs[left_key] == rhs[right_key])
        & (lhs["_bkt"] == rhs["_bkt"])
        & (rhs["_rs"] >= lhs["_lo"])
        & (rhs["_rs"] < lhs["_hi"])
    )
    return lhs.join(rhs, cond).select(*left.columns, *right.columns)


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    bucket: str = "1 day",
) -> DataFrame:
    """Hypertable-style time-bucket rollup with gap filling and LOCF
    (TimescaleDB's ``time_bucket_gapfill`` + ``locf`` shape): aggregate
    ``value_col`` per (``group_cols``, truncated ``ts_col``) bucket, then
    densify every group onto the corpus-wide bucket spine so downstream
    window math (moving averages, deltas) never silently skips empty
    buckets.

    Output per (group, bucket): ``n_rows`` (0 for generated gap rows),
    ``total`` (NULL in gaps), ``total_locf`` (last non-null total carried
    forward within the group), ``filled`` flag.

    Plan shape at scale: the ONLY pass over the fact table is the first
    map-side-combined aggregation; everything after operates on
    #groups x #buckets rows.  The spine comes from a single-row min/max
    aggregate, ``sequence()``-exploded and cross-joined to the distinct
    group keys (both tiny, broadcast); the LOCF window partitions by
    group over the dense per-group series.
    """
    gcols = list(group_cols)
    trunc_unit = bucket.split()[-1].rstrip("s")  # "1 day" -> "day"
    b = F.date_trunc(trunc_unit, F.col(ts_col).cast("timestamp"))
    agg = df.groupBy(*gcols, b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).cast("decimal(18,6)"))
        .cast("double")
        .alias("total"),
    )
    bounds = agg.agg(
        F.min("bucket").alias("_min"), F.max("bucket").alias("_max")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("_min", "_max", F.expr(f"INTERVAL {bucket}"))
        ).alias("bucket")
    )
    groups = agg.select(*gcols).distinct() if gcols else None
    dense = (
        groups.crossJoin(F.broadcast(spine)) if groups is not None else spine
    )
    out = dense.join(agg, [*gcols, "bucket"], "left")
    w = (
        Window.partitionBy(*gcols)
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.select(
        *gcols,
        "bucket",
        F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
        "total",
        F.last("total", ignorenulls=True).over(w).alias("total_locf"),
        F.col("n_rows").isNull().alias("filled"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Change-data-feed between two table snapshots (the Delta/Iceberg
    "what changed from v1 to v2" shape, derived when the table format
    keeps no changelog): classify every key as ``insert`` (new only),
    ``delete`` (old only), or ``update`` (both, any compared column
    differs — null-safe); unchanged keys are omitted.

    Output: key columns, ``change_type``, and each compared column as a
    ``(old_<c>, new_<c>)`` pair.  The inverse of the CDC apply path
    (``apply.py``): apply turns a changelog into a snapshot, this turns
    two snapshots back into a changelog (e.g. to backfill downstream
    consumers after a non-CDC bulk rewrite).

    One shuffle per side on the key — the partitioning the table already
    has if bucketed (`operators/layout.py`) — a single full outer join,
    and a null-safe comparison; no collects, no windows.  At 100 TB this
    is two co-partitioned scans and the join; AQE handles size asymmetry
    (a small patch snapshot broadcasts).
    """
    keys = list(key_cols)
    cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in keys]
    )
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in cols],
        F.lit(1).alias("_in_new"),
    )
    cond = None
    for k in keys:
        c = o[f"_ok_{k}"] == n[f"_nk_{k}"]
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    changed = None
    for c in cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        changed = d if changed is None else changed | d
    change_type = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(changed if changed is not None else F.lit(False), F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k)
                for k in keys
            ],
            "change_type",
            *[x for c in cols for x in (f"old_{c}", f"new_{c}")],
        )
    )


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
    route_col: Optional[str] = None,
    delete_value: str = "delete",
) -> DataFrame:
    """Materialize a slowly-changing-dimension Type-2 history table from
    a changelog: every change row becomes a versioned validity interval
    ``[valid_from, valid_to)`` per key, with ``valid_to`` the next
    change's timestamp (NULL while the image is still current) and
    ``is_current`` flagging the open interval.

    This is the CDC-lakehouse pattern the last-image MERGE path
    (``apply.py``) deliberately discards: instead of keeping only the
    newest row per key, the full change history stays queryable
    ("what did this row look like on date X" = ``valid_from <= X <
    valid_to``).

    With ``route_col``, rows whose route equals ``delete_value`` act as
    interval CLOSERS: they bound the previous version's ``valid_to`` but
    emit no version of their own — after a delete the key simply has no
    current row (and a later re-insert starts a new open interval).
    Version numbers count surviving (non-delete) images in change order.

    One window over ``(key, ts, tiebreaks)`` — a single shuffle on the
    key, the partitioning every CDC table already has; at 100 TB this
    runs per key-partition with no cross-key traffic.  Deterministic
    given a unique tiebreak (pass the change sequence / event id).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = changes.withColumn("valid_to", F.lead(ts_col).over(w))
    if route_col is not None:
        out = (
            out.withColumn(
                "version",
                F.sum(
                    F.when(F.col(route_col) == delete_value, 0).otherwise(1)
                ).over(w),
            )
            .filter(F.col(route_col) != delete_value)
            .drop(route_col)
        )
    else:
        out = out.withColumn("version", F.row_number().over(w))
    return (
        out.withColumn("valid_from", F.col(ts_col))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version", F.col("version").cast("int"))
    )

def hopping_window_agg(
    df: DataFrame,
    ts_col: str,
    window: str = "3 hours",
    slide: str = "1 hour",
    group_cols: Sequence[str] = (),
    value_col: Optional[str] = None,
) -> DataFrame:
    """Hopping (sliding) time-window aggregation: count and total per
    (``group_cols``, epoch-aligned window of length ``window`` every
    ``slide``).  Each event lands in ``window/slide`` overlapping
    windows — the smoothing shape behind rate dashboards, rolling QPS,
    and the windowed counts the streaming layer exposes; this is the
    batch replay of the same `F.window` semantics, so batch backfill
    and the live stream agree bucket-for-bucket.

    Spark's ``window(ts, window, slide)`` replicates rows to their
    covering windows inside codegen (no explicit explode) and the
    aggregation map-side-combines per (group, window-start): one
    shuffle, candidate volume = rows x window/slide.  Totals are summed
    as DECIMAL(18,6) (exact, order-independent) and surfaced as DOUBLE
    — the same bridge every other money aggregate here uses.
    """
    gcols = list(group_cols)
    w = F.window(F.col(ts_col), window, slide)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("total")
        )
    return (
        df.groupBy(*gcols, w.alias("_w"))
        .agg(*aggs)
        .select(
            *gcols,
            F.col("_w.start").alias("hop_start"),
            F.col("_w.end").alias("hop_end"),
            "n_rows",
            *(["total"] if value_col is not None else []),
        )
    )
