"""Day-N curve for the incremental near-dup index (VERDICT r11 #2/#4):
per-batch probe cost as a FUNCTION OF INDEX SIZE, from RELOADED
artifacts, flat layout vs bucket-partitioned (`bucket_partitions = P`).

The question this answers: as the corpus the index covers grows day
over day, what does tomorrow's probe cost?  The candidate join's input
is the stored bucket table, so a flat layout's probe scan grows
linearly with the index; the hive-partitioned layout lets a batch
prune to its own bucket prefixes — a point probe (1 doc, ≤ bands
buckets) reads ~bands/P of the store's files regardless of index size.

Run: python tools/measure_neardup_curve.py [sf_dir] [reps...]
Writes NEARDUP_CURVE.json at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdc_data_lake_pyspark_spark.operators.dedup_text import (  # noqa: E402
    load_minhash_index,
    minhash_index,
    minhash_probe,
    save_minhash_index,
)
from cdc_data_lake_pyspark_spark.session import build_session  # noqa: E402

#: bucket-prefix partition count for the partitioned layout
P = 64

#: fixed probe batch size — "today's crawl" stays constant while the
#: index (the seen corpus) grows
BATCH_DOCS = 500


def _dir_mb(path: str) -> float:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return round(total / 1e6, 1)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = [int(r) for r in sys.argv[2:]] or [1, 4, 16]
    spark = build_session(app_name="neardup-curve")
    docs_1x = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull())
    )
    n_1x = docs_1x.count()
    # the fixed daily batch: near-dup re-crawls of the first BATCH_DOCS
    # docs (one appended token), under fresh ids — every batch doc has
    # exactly one true near-dup in the index at every size
    batch = (
        docs_1x.filter(F.col("doc_id") < BATCH_DOCS)
        .select(
            (F.col("doc_id") + 900_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        )
        .localCheckpoint()
    )
    one_doc = batch.orderBy("doc_id").limit(1).localCheckpoint()
    rows = []
    for rep in reps:
        if rep == 1:
            corpus = docs_1x
        else:
            corpus = docs_1x.crossJoin(
                spark.range(rep).select(F.col("id").alias("_r"))
            ).select(
                (F.col("doc_id") + F.col("_r") * 10_000_000).alias("doc_id"),
                "text",
            )
        t0 = time.time()
        index = minhash_index(corpus)
        flat_dir = tempfile.mkdtemp(prefix=f"ndc_flat_{rep}_")
        part_dir = tempfile.mkdtemp(prefix=f"ndc_part_{rep}_")
        save_minhash_index(index, flat_dir)
        build_sec = round(time.time() - t0, 2)
        save_minhash_index(index, part_dir, bucket_partitions=P)
        row = {
            "indexed_docs": n_1x * rep,
            "build_and_save_sec": build_sec,
            "index_mb": _dir_mb(flat_dir),
        }
        for label, d in (("flat", flat_dir), ("part", part_dir)):
            fresh = spark.newSession()
            t0 = time.time()
            loaded = load_minhash_index(fresh, d)
            row[f"{label}_load_sec"] = round(time.time() - t0, 2)
            t0 = time.time()
            n_pairs = minhash_probe(batch, loaded, threshold=0.6).count()
            row[f"{label}_probe_sec"] = round(time.time() - t0, 2)
            row[f"{label}_probe_pairs"] = n_pairs
            t0 = time.time()
            minhash_probe(one_doc, loaded, threshold=0.6).count()
            row[f"{label}_point_probe_sec"] = round(time.time() - t0, 2)
        # pruning is about BYTES READ, which local wall times hide at
        # MB-scale stores: count the bucket-store data files a point
        # probe admits under each layout (the partition filter's file
        # set vs everything)
        from cdc_data_lake_pyspark_spark.operators.dedup_text import (
            _banded,
            minhash_signatures,
        )

        pfxs = {
            r[0]
            for r in _banded(
                minhash_signatures(one_doc), index.bands,
                index.rows_per_band,
            )
            .select(F.pmod(F.col("bucket"), F.lit(P)).cast("int"))
            .distinct()
            .collect()
        }

        def _n_files(d):
            return sum(
                1
                for root, _, files in os.walk(d)
                for f in files
                if f.endswith(".parquet")
            )

        row["point_files_flat"] = _n_files(f"{flat_dir}/buckets")
        row["point_files_part"] = sum(
            _n_files(f"{part_dir}/buckets/_pfx={p}") for p in pfxs
        )
        row["point_files_part_total"] = _n_files(f"{part_dir}/buckets")
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = {
        "sf_dir": sf_dir,
        "batch_docs": BATCH_DOCS,
        "bucket_partitions": P,
        "curve": rows,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "NEARDUP_CURVE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "neardup_curve", "points": len(rows)}))


if __name__ == "__main__":
    main()
