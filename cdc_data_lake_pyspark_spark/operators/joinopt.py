"""Join-reduction utilities: Bloom-prefiltered joins and join-consistent
correlated sampling.

Two techniques whose entire value appears at cluster scale:

* **Bloom semi-join reduction** — before shuffling a huge probe side
  into a join, pre-filter it against a Bloom filter built from the
  build side's keys.  Rows whose keys are *definitely absent* (the
  Bloom guarantee — no false negatives) drop BEFORE the exchange, so
  shuffle volume falls to matching-rows + the false-positive sliver,
  and the join result is EXACTLY the plain join's (false positives are
  removed by the join itself).  This is the runtime-filter /
  sideways-information-passing optimization (Spark's own
  ``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``, Trino's
  dynamic filtering) made explicit, portable, and testable — the same
  portable filter the streaming novelty gate probes.

* **Correlated (join-preserving) sampling** — sampling each table
  independently destroys join structure (a sampled order loses its
  lineitems with probability 1-p).  Hashing the JOIN KEY into the
  keep-decision samples the same key set on every table, so foreign-key
  joins over the samples are complete subgraphs of the full join —
  the dev-corpus / cost-estimate sampling pattern.  Map-only, no
  shuffle, deterministic across engines via the portable hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.functions.sketch import (
    bloom_positions,
    bloom_sketch,
)
from cdc_data_lake_pyspark_spark.operators.relational import portable_id_hash


def _fast_positions(value, depth: int, m_bits: int):
    """Bloom bit positions over xxhash64 — one cheap JVM hash per row per
    hash row (the portable md5 hash costs ~an order of magnitude more
    CPU; use ``portable=True`` only when another engine must replay the
    filter bits)."""
    return F.array(
        *[
            F.pmod(
                F.xxhash64(F.lit(i), value),
                F.lit(m_bits),
            )
            for i in range(depth)
        ]
    )


def _fast_cells(build_keys: DataFrame, depth: int, m_bits: int) -> DataFrame:
    return (
        build_keys.select(
            F.posexplode(
                _fast_positions(F.col("_k"), depth, m_bits)
            ).alias("hash_row", "bit")
        )
        .distinct()
    )


def bloom_prefiltered_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    how: str = "inner",
    depth: int = 4,
    m_bits: int = 65536,
    portable: bool = False,
) -> DataFrame:
    """Join ``probe`` to ``build`` on ``key`` with a Bloom semi-join
    reduction of the probe side.

    The filter state is ``min(depth·|build keys|, depth·m_bits)`` sparse
    cells — broadcastable however large the probe side is.  A probe row
    survives the pre-filter iff ALL ``depth`` of its positions are set;
    Bloom has no false negatives, so every matching row survives and
    the join output is exactly ``probe.join(build, key, how)``.  The
    false-positive sliver (rate ≈ (1-e^(-depth·n/m))^depth) pays the
    shuffle but is removed by the join.

    Only meaningful for ``inner``/``left_semi`` (shapes where probe rows
    without a match are dropped anyway), and only WORTH it when the
    build side is too big to broadcast but selective — when the build
    side broadcasts, the broadcast hash join already never shuffles the
    probe and the pre-filter is pure overhead.  The Bloom cells are
    ≤ depth·m_bits rows REGARDLESS of build size, so they broadcast
    even when the build side (with its payload columns) cannot: the
    reduction turns "shuffle the whole fact into the sort-merge join"
    into "shuffle the matching slice".  Positions use xxhash64 (cheap
    JVM hash) by default; ``portable=True`` switches to the md5-based
    portable hash for cross-engine filter replay at ~10x the hash CPU.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError("bloom prefilter changes semantics for outer joins")
    build_keys = build.select(F.col(key).cast("string").alias("_k"))
    if portable:
        cells = bloom_sketch(build_keys, "_k", depth=depth, m_bits=m_bits)
        pos = bloom_positions(F.col(key).cast("string"), depth, m_bits)
    else:
        cells = _fast_cells(build_keys, depth, m_bits)
        pos = _fast_positions(F.col(key).cast("string"), depth, m_bits)
    cells = cells.localCheckpoint(eager=True)
    probe_pos = probe.withColumn("_pos", pos)
    # membership = AND over hash rows, as a chain of BROADCAST left-semi
    # joins (one O(1) hash-table lookup per row per hash row — never a
    # per-row scan of the bitset, never a shuffle of the probe side)
    pre = probe_pos
    for i in range(depth):
        cells_i = (
            cells.filter(F.col("hash_row") == i)
            .select(F.col("bit").alias(f"_b{i}"))
        )
        pre = pre.join(
            F.broadcast(cells_i),
            pre["_pos"][i] == F.col(f"_b{i}"),
            "left_semi",
        )
    pre = pre.drop("_pos")
    return pre.join(build, key, how)


def correlated_sample(
    df: DataFrame,
    key_col: str,
    keep_pct: int = 10,
) -> DataFrame:
    """Keep rows whose JOIN KEY hashes into the sampled ``keep_pct``
    percent — apply with the same key and rate to every table that
    joins on it, and the samples' joins are exactly the full join
    restricted to the sampled key set (no orphaned facts, no broken
    foreign keys).  Map-only; deterministic in any engine via the
    portable hash."""
    return df.filter(
        F.pmod(portable_id_hash(F.col(key_col).cast("string")), F.lit(100))
        < keep_pct
    )
