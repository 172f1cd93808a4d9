"""Skew-mitigation utilities: salted joins and salted aggregation.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`) splits
oversized partitions at runtime and is the first line of defense — these
helpers cover the cases AQE cannot fix:

* a shuffled join where ONE key holds a partition-sized share of the rows
  (AQE splits the partition, but every split of the hot key still joins
  against the same single build row — salting replicates that build row);
* high-cardinality aggregation where one key dominates (two-phase salted
  aggregation pre-collapses the hot key on every core).

Both are deterministic: the salt derives from `xxhash64` of the row's own
columns, never `rand()`, so retries/replays produce identical results.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(
    df: DataFrame, n_salts: int, salt_from: Optional[Sequence[str]] = None
) -> DataFrame:
    """Add a deterministic salt in ``[0, n_salts)`` derived from
    ``salt_from`` columns (default: all columns)."""
    cols = list(salt_from) if salt_from else df.columns
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    )


def replicate_for_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate every row once per salt value (the build/small side of a
    salted join)."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed frame against ``other`` on ``keys`` with the hot keys
    spread over ``n_salts`` partitions.

    The skewed side salts each row deterministically; ``other`` is
    replicated ``n_salts``× so every salted partition finds its match.
    Equivalent to ``skewed.join(other, keys, how)`` for inner/left joins
    (asserted in tests); cost: ``other`` shuffles ``n_salts``× its size —
    use when ``other`` is far smaller than the hot key's row share but too
    big (or too mutable) to broadcast.
    """
    keys = list(keys)
    non_key_cols = [c for c in skewed.columns if c not in keys]
    left = with_salt(skewed, n_salts, salt_from=non_key_cols or None)
    right = replicate_for_salt(other, n_salts)
    return left.join(right, on=keys + [SALT_COL], how=how).drop(SALT_COL)


def salted_count_by_key(
    df: DataFrame, keys: Sequence[str], n_salts: int = 8
) -> DataFrame:
    """Two-phase salted count: ``groupBy(keys, salt)`` partial counts, then
    ``groupBy(keys)`` sum — the hot key is pre-collapsed ``n_salts`` ways.

    (Spark's partial aggregation already does this map-side; the explicit
    two-phase form matters when the combiner is disabled or the aggregate
    is not partial-able, and it documents the pattern.)
    """
    keys = list(keys)
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, SALT_COL).agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(*keys).agg(F.sum("_c").alias("n"))


def key_skew_report(
    df: DataFrame, keys: Sequence[str], top_n: int = 10
) -> DataFrame:
    """Skew diagnostics: the ``top_n`` heaviest keys with their row
    counts and share of the table — the measurement that decides whether
    a join needs :func:`salted_join` (rule of thumb: a key above a few
    percent of the table, or above one executor's memory, is hot).

    One aggregation on the key (map-side combined) + one broadcast of
    the single-row total.  The per-key frame is #distinct-keys rows —
    billions for a user-id key — so the top-N selection uses
    ``orderBy().limit(top_n)`` (TakeOrderedAndProject: per-partition
    ``top_n``-row heaps merged on the driver) rather than an
    unpartitioned rank window, which would move every distinct key to
    one partition.  The ``rank`` column is then derived over only the
    ``top_n`` survivors.  ``share`` is one IEEE divide of exact counts —
    reproducible across engines.
    """
    from .relational import ranked_topk

    keys = list(keys)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = df.agg(F.count(F.lit(1)).alias("_t"))
    order = [F.col("n").desc(), *[F.col(k).asc() for k in keys]]
    return (
        ranked_topk(counts, order, top_n)
        .crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n",
            (F.col("n").cast("double") / F.col("_t").cast("double")).alias(
                "share"
            ),
            "rank",
        )
    )
