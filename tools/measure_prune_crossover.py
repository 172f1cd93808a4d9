"""Bucket-partition pruning crossover (VERDICT r12 "what's wrong" #4):
at what store size does ``save_minhash_index(bucket_partitions=P)``
WIN on a point probe, not just admit fewer files?

The r12 measurements showed the partitioned layout admitting 448 of
2,048 files (= bands/P, as designed) but never a wall-time or bytes win
at MB-scale stores — partitionBy multiplies small files and their
open/footer overhead dominates.  This tool measures the candidate-
discovery wall for a ONE-DOCUMENT probe (the index-once / probe-daily
point-probe mode §20 describes) against the SAME banded bucket table
saved both ways, across store sizes, using the shipped probe path
(``load_minhash_index`` → ``_pruned_index_buckets`` →
``_estimate_candidates``).

Bucket rows are synthesized (``xxhash64`` over a range — high-entropy
bucket values exactly like real banded minhashes) because the quantity
under measurement is scan/prune cost, which depends on layout and row
count, not on where the 64-bit bucket values came from; the probe's 16
rows are sampled FROM the store so the hash join does real work.

Run: python tools/measure_prune_crossover.py [n_docs ...]
Writes PRUNE_CROSSOVER.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdc_data_lake_pyspark_spark.operators.dedup_text import (  # noqa: E402
    MinHashIndex,
    _estimate_candidates,
    _pruned_index_buckets,
    load_minhash_index,
    save_minhash_index,
)
from cdc_data_lake_pyspark_spark.session import build_session  # noqa: E402

BANDS = 16
P = 64


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    )


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [250_000, 1_000_000, 4_000_000]
    spark = build_session(app_name="prune-crossover")
    rows = []
    for n_docs in sizes:
        work = tempfile.mkdtemp(prefix="prune_")
        # synthetic banded bucket table: n_docs × BANDS rows, bucket =
        # xxhash64(doc_id, band) — the shape minhash banding produces
        buckets = (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.explode(
                    F.sequence(F.lit(0), F.lit(BANDS - 1))
                ).alias("band"),
            )
            .select(
                "doc_id",
                F.col("band").cast("int"),
                F.xxhash64("doc_id", "band").alias("bucket"),
            )
        )
        sigs = spark.range(1).select(
            F.col("id").alias("doc_id"),
            F.array(F.lit(0).cast("long")).alias("sig"),
        )
        for label, bp in (("flat", 0), ("partitioned", P)):
            save_minhash_index(
                MinHashIndex(sigs, buckets, 64, 3, BANDS, BANDS // 4),
                f"{work}/{label}",
                bucket_partitions=bp,
            )
        # the probe: ONE document's rows, sampled from the store itself
        bban = (
            spark.read.parquet(f"{work}/flat/buckets")
            .filter(F.col("doc_id") == 0)
            .localCheckpoint()
        )
        row = {"n_docs": n_docs, "bucket_rows": n_docs * BANDS}
        for label in ("flat", "partitioned"):
            index = load_minhash_index(spark, f"{work}/{label}")
            store = f"{work}/{label}/buckets"
            row[f"{label}_store_mb"] = round(
                _dir_bytes(store) / 1e6, 1
            )
            if label == "partitioned":
                pfxs = {
                    r[0]
                    for r in bban.select(
                        F.pmod(F.col("bucket"), F.lit(P)).cast("int")
                    ).distinct().collect()
                }
                admitted = sum(
                    _dir_bytes(f"{store}/_pfx={p}") for p in pfxs
                )
                row["admitted_mb"] = round(admitted / 1e6, 1)
            walls = []
            for _ in range(3):
                t0 = time.time()
                _estimate_candidates(
                    bban, _pruned_index_buckets(bban, index)
                ).count()
                walls.append(time.time() - t0)
            row[f"{label}_probe_sec"] = round(sorted(walls)[1], 3)
        row["speedup"] = round(
            row["flat_probe_sec"] / row["partitioned_probe_sec"], 2
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(work, ignore_errors=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PRUNE_CROSSOVER.json"), "w") as f:
        json.dump({"bands": BANDS, "partitions": P, "rows": rows}, f,
                  indent=1)
    print(json.dumps({"metric": "prune_crossover", "points": len(rows)}))


if __name__ == "__main__":
    main()
