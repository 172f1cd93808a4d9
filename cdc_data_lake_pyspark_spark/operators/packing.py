"""Sequence packing: assign documents to fixed token-budget bins — the
"pack short documents into 4k-token training sequences" step of an LLM
data pipeline.

Greedy first-fit-in-id-order is inherently sequential (each decision
depends on the running fill), so it cannot be a window expression.  The
scale design makes the sequential part small instead of avoiding it:

* the corpus is split into ``n_groups`` INDEPENDENT packing groups by a
  portable hash of the id — deterministic, layout-independent, and each
  group packs in isolation (bins never span groups);
* each group packs inside one ``applyInPandas`` call: a linear pandas pass
  over that group's (id-sorted) rows.  One shuffle total, Arrow-batched,
  no driver involvement;
* at 100 TB you raise ``n_groups`` to O(cluster cores × k): groups shrink,
  parallelism grows, and the per-group loop stays a cache-friendly linear
  scan.  Packing efficiency is unaffected — bins are per-group by design
  (training sequences don't care which worker packed them).

Determinism contract: same corpus ⇒ same (group, bin, fill) for every doc,
regardless of partitioning — the group hash is the portable md5 bridge
(reproducible in DuckDB, see queries_phase4), and in-group order is the id.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.relational import portable_id_hash


def pack_documents(
    docs: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_groups: int = 16,
) -> DataFrame:
    """Pack docs into token-budget bins: ``(group, doc_id, n_tokens, bin)``.

    Greedy first-fit in ascending id order within each hash group: a doc
    joins the current bin while the bin's fill + its tokens stay ≤
    ``budget``; otherwise it opens the next bin.  A doc larger than the
    whole budget gets a bin of its own (never dropped, never split).
    ``bin`` is the 1-based per-group bin index.
    """
    with_group = docs.select(
        F.pmod(portable_id_hash(F.col(id_col)), F.lit(n_groups))
        .cast("int")
        .alias("group"),
        F.col(id_col),
        F.col(token_col).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        bins = []
        b, fill = 0, 0
        for t in pdf["n_tokens"]:
            if b == 0 or fill + t > budget:
                b += 1
                fill = int(t)
            else:
                fill += int(t)
            bins.append(b)
        pdf = pdf.copy()
        pdf["bin"] = pd.Series(bins, index=pdf.index, dtype="int64")
        return pdf

    schema = f"group int, {id_col} long, n_tokens long, bin long"
    return with_group.groupBy("group").applyInPandas(pack, schema)
