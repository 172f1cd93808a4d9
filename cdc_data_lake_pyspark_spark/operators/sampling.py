"""Deterministic sampling: per-stratum rate sampling from a portable id
hash — the data-mixing step of a training pipeline ("keep 50% of en,
25% of de, 10% of everything else"), reproducible across engines, runs,
and cluster layouts.

Spark's ``sampleBy``/``sample`` draw from per-partition RNG streams, so
the selected set changes with partitioning and task scheduling — useless
for auditable corpus construction.  Here the keep decision is a pure
function of the row id: ``portable_hash(id) % RESOLUTION < rate``.
Map-only (no shuffle, no state); adding data never reselects existing
rows; DuckDB reproduces the exact row set (see queries_phase4).
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.relational import portable_id_hash

#: sampling-rate resolution: rates are quantized to millionths
RESOLUTION = 1_000_000


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: Optional[float] = None,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``fractions`` maps stratum value → keep rate in [0, 1]; strata not
    listed use ``default_fraction`` (None ⇒ dropped entirely).  The hash
    is salted with the stratum value so the same id draws independently
    across strata re-labelings.
    """
    ticket = F.pmod(
        portable_id_hash(F.concat_ws("|", F.col(strata_col), F.col(id_col))),
        F.lit(RESOLUTION),
    )
    thresh = None
    for value, frac in fractions.items():
        cut = F.lit(int(frac * RESOLUTION))
        cond = F.col(strata_col) == value
        thresh = F.when(cond, cut) if thresh is None else thresh.when(cond, cut)
    if thresh is None:
        thresh = F.lit(
            int((default_fraction or 0.0) * RESOLUTION)
        )
    else:
        thresh = thresh.otherwise(
            F.lit(int(default_fraction * RESOLUTION))
            if default_fraction is not None
            else F.lit(0)
        )
    return df.filter(ticket < thresh)


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "epoch-0",
    keep_cols: tuple = (),
) -> DataFrame:
    """Deterministic epoch ORDER for training: assign every row a
    ``(shard, pos)`` so that reading shards in pos order replays one
    seeded global shuffle of the corpus — the data-order stage every
    trainer needs (public practice: dataset pipelines materialize a
    seeded shuffle per epoch so runs are reproducible and sources /
    languages arrive interleaved, not in ingestion runs).

    The order key is ``portable_hash(seed | id)``: uniform, so any
    contiguous read interleaves sources proportionally in expectation
    (the property batch-level mixing needs), and changing ``seed``
    yields an independent epoch order while rows keep their identity.
    Spark's ``df.sample``/``rand`` orders change with partitioning and
    scheduling; this one is a pure row function — reproducible across
    engines, runs, and cluster layouts (DuckDB replays it exactly).

    Scale shape: key + shard are map-only; ``pos`` is a row_number
    windowed WITHIN each shard — one exchange on the shard id plus a
    per-shard local sort, exactly the write-time
    ``repartition(shard).sortWithinPartitions(key)`` layout a training
    export job runs.  No global sort: at 100 TB you size ``n_shards``
    to the output-file budget (10k+), so each window partition is one
    output file's rows.
    """
    h = portable_id_hash(
        F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))
    )
    from pyspark.sql import Window

    keyed = df.select(
        id_col,
        *keep_cols,
        h.alias("_h"),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return keyed.select(
        id_col,
        *keep_cols,
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )
