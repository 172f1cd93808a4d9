"""Cardinality sketching: a PORTABLE HyperLogLog whose register state is
exact integer arithmetic over the portable md5 hash — so the sketch (not
just the estimate) is reproducible bit-for-bit in any engine, and the
DuckDB oracle can verify it (queries_phase4).

Why not ``approx_count_distinct``: Spark's HLL++ is correct but its
register state is engine-private — unverifiable across systems, and
sketches built elsewhere can't merge with it.  This one is the textbook
Flajolet et al. construction over a fixed hash, which makes the sketch a
portable ARTIFACT: per-partition / per-file sketches computed by any
engine merge by register-max.

Scale story: the sketch state is ``m`` registers per group — constant
size.  The aggregation is one shuffle keyed by (group, register); partial
max combines map-side, so 100 TB of rows reduce to ``groups × m`` tiny
rows before the exchange.  The decoded estimate is driver-side float math
over one row per group.

State encoding (what the operators emit):
* ``v_empty``  — registers never hit (needed for linear counting);
* ``sum_pow``  — Σ 2^(53 − M_j) over NON-empty registers, a BIGINT:
  the harmonic-mean denominator scaled by 2^53 so it stays integer-exact
  (M_j ≤ 53 ⇒ each term ≤ 2^52; m ≤ 2^12 terms fit comfortably).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.relational import portable_id_hash

#: hash width consumed by the sketch (the portable hash is 60-bit)
_HASH_BITS = 60


def hll_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register state: ``(*group_cols, m, v_empty, sum_pow)``.

    ``p`` index bits ⇒ ``m = 2**p`` registers; the remaining
    ``60 − p`` hash bits feed the leading-zero rank.  Two aggregations:
    (group, register) → max rank, then group → the integer state.
    """
    m = 1 << p
    w_bits = _HASH_BITS - p
    hv = portable_id_hash(F.col(value_col))
    j = F.pmod(hv, F.lit(m))
    w = F.floor(hv / F.lit(m)).cast("long")
    # rank = leading zeros of the (60-p)-bit suffix + 1 = (w_bits+1) - bit_length(w)
    bit_length = F.length(F.conv(w.cast("string"), 10, 2))
    rank = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - bit_length
    )
    regs = (
        df.select(*group_cols, j.alias("_j"), rank.alias("_rank"))
        .groupBy(*group_cols, "_j")
        .agg(F.max("_rank").alias("_m_j"))
    )
    return regs.groupBy(*group_cols).agg(
        F.lit(m).alias("m"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("v_empty"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({w_bits + 1} - _m_j AS INT))")
        ).alias("sum_pow"),
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch state: ``(hash_row, bucket, n)`` — ``depth``
    independent hash rows of ``width`` counters, counting occurrences of
    ``value_col``.  Point estimate for a value = min over rows of its
    bucket's counter (overestimates only; error ≤ n/width w.h.p.).

    Like :func:`hll_sketch`, the state is exact integer arithmetic over
    the portable hash (row-salted), so the whole sketch is verifiable in
    DuckDB and sketches from different engines/partitions merge by
    element-wise SUM.  One posexplode (depth rows per input) + one
    map-side-combined aggregation to ``depth × width`` rows.
    """
    buckets = F.array(
        *[
            F.pmod(
                portable_id_hash(
                    F.concat_ws("|", F.lit(i), F.col(value_col))
                ),
                F.lit(width),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.posexplode(buckets).alias("hash_row", "bucket"))
        .groupBy("hash_row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bloom_positions(
    value, depth: int = 4, m_bits: int = 8192
) -> "F.Column":
    """The ``depth`` bit positions a value sets in a portable Bloom
    filter: ``portable_hash(i|value) % m_bits`` per hash row ``i`` — the
    same row-salting scheme as :func:`cms_sketch`, so any engine computes
    the identical positions."""
    return F.array(
        *[
            F.pmod(
                portable_id_hash(F.concat_ws("|", F.lit(i), value)),
                F.lit(m_bits),
            )
            for i in range(depth)
        ]
    )


def bloom_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    m_bits: int = 8192,
) -> DataFrame:
    """Portable Bloom-filter state in sparse form: the DISTINCT
    ``(hash_row, bit)`` cells set by ``value_col`` — at most
    ``min(depth × n, depth × m_bits)`` rows, bounded by the filter size
    regardless of corpus size.  Membership: a probe value is *possibly
    present* iff all ``depth`` of its positions exist in the state;
    *definitely absent* otherwise (false-positive rate ≈
    ``(1 − e^(−depth·n/m_bits))^depth``, no false negatives).  Filters
    from different engines / partitions / days merge by set-union of
    cells — the incremental-ingestion index artifact.

    Like the HLL and CMS state, every cell is exact integer arithmetic
    over the portable md5 hash, so DuckDB reproduces the sketch
    bit-for-bit.  One posexplode + a map-side-combined distinct.
    """
    return (
        df.select(
            F.posexplode(
                bloom_positions(F.col(value_col), depth, m_bits)
            ).alias("hash_row", "bit")
        )
        .groupBy("hash_row", "bit")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("hash_row", "bit")
    )


def bloom_probe(
    state: DataFrame,
    probes: DataFrame,
    value_col: str,
    id_cols: Sequence[str],
    depth: int = 4,
    m_bits: int = 8192,
) -> DataFrame:
    """Probe a Bloom state: per probe row, how many of its ``depth``
    positions are set (``n_hits``) and the membership verdict
    (``maybe_seen = n_hits == depth``).  The join carries
    ``(id, hash_row, bit)`` rows against the bounded state — AQE
    broadcasts the state when it fits; at extreme scale it is an
    ordinary shuffled join on the cell key, never a corpus rescan."""
    ex = probes.select(
        *id_cols,
        F.posexplode(bloom_positions(F.col(value_col), depth, m_bits)).alias(
            "hash_row", "bit"
        ),
    )
    hit = ex.join(
        state.withColumn("_set", F.lit(1)), ["hash_row", "bit"], "left"
    )
    return hit.groupBy(*id_cols).agg(
        F.sum(F.coalesce(F.col("_set"), F.lit(0))).alias("n_hits")
    ).select(
        *id_cols,
        "n_hits",
        (F.col("n_hits") == depth).alias("maybe_seen"),
    )


def cms_estimate(state, value: str, depth: int = 4, width: int = 256) -> int:
    """Decode a point estimate from collected sketch rows (pytest helper).

    ``state`` is ``{(hash_row, bucket): n}``; absent cells are zero."""
    import hashlib

    def phash(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return min(
        state.get((i, phash(f"{i}|{value}") % width), 0) for i in range(depth)
    )


def hll_estimate(m: int, v_empty: int, sum_pow: int, p: int = 8) -> float:
    """Decode a sketch row into a cardinality estimate (standard HLL
    bias-corrected harmonic mean + linear-counting small-range fix)."""
    w_bits = _HASH_BITS - p
    alpha = 0.7213 / (1 + 1.079 / m)
    # empty registers contribute 2^-0 = 1 each, scaled: 2^(w_bits+1)
    z_scaled = sum_pow + v_empty * (1 << (w_bits + 1))
    estimate = alpha * m * m * float(1 << (w_bits + 1)) / float(z_scaled)
    if estimate <= 2.5 * m and v_empty > 0:
        return m * math.log(m / v_empty)
    return estimate


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    width: float = 25_000.0,
    n_buckets: int = 20,
) -> DataFrame:
    """Fixed-width histogram state: ``(*group_cols, bucket, n)`` with
    ``bucket = clamp(floor(value / width), 0, n_buckets-1)`` — the
    mergeable approximate-quantile sketch (merge = cell-wise SUM, like
    CMS).  Decode with :func:`histogram_quantile`; the estimate's error
    is bounded by one bucket width, traded off against state size
    (``groups × n_buckets`` rows from any corpus size).

    Where exact per-group percentiles (`relational.quantile_buckets`,
    `segment_price_percentiles`) need a full sort per group, this is one
    map-side-combined aggregation — the 100 TB path.  Bucketing is a
    single IEEE divide + floor on each side, so DuckDB reproduces the
    state exactly.
    """
    bucket = (
        F.greatest(
            F.lit(0),
            F.least(
                F.floor(F.col(value_col) / F.lit(float(width))),
                F.lit(n_buckets - 1),
            ),
        )
    ).cast("int")
    return (
        df.select(*group_cols, bucket.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_quantile(
    cells: dict[int, int], q: float, width: float = 25_000.0
) -> float:
    """Decode a quantile estimate from one group's collected histogram
    cells (``{bucket: n}``) by linear interpolation inside the target
    bucket (pytest/driver helper; the sketch itself stays distributed)."""
    total = sum(cells.values())
    if total == 0:
        raise ValueError("empty histogram")
    rank = q * total
    cum = 0.0
    for b in sorted(cells):
        n = cells[b]
        if cum + n >= rank:
            frac = 0.0 if n == 0 else (rank - cum) / n
            return (b + frac) * width
        cum += n
    top = max(cells)
    return (top + 1) * width


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """K-minimum-values distinct sketch (Beyer et al. 2007): the ``k``
    smallest DISTINCT portable-hash values of ``value_col`` — a
    fixed-size, mergeable summary of the column's key set.

    The KMV estimator: if the k-th smallest of uniformly-hashed distinct
    values is ``h_k``, the distinct count ≈ ``(k-1) · H / h_k`` for hash
    space ``H``.  Sketches MERGE by taking the k smallest of the union,
    and the overlap of two sketches estimates Jaccard — which is what
    makes KMV the standard join-cardinality estimator: planners size
    ``|A ⋈ B|`` from two tiny sketches instead of scanning either side.

    State is exact integers over the portable hash, so any engine
    reproduces the identical sketch (the cross-engine contract every
    sketch in this module keeps).  One distinct + one global
    TakeOrdered(k) — no full sort at scale.
    """
    hv = portable_id_hash(F.col(value_col).cast("string"))
    return (
        df.select(hv.alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )
