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
