"""100x axis for the incremental embedding-dedup path (VERDICT r12 #2):
what does the DAILY vector probe cost once the IVF-PQ prefit exists on
disk?

Splits the lifecycle the way a daily pipeline pays for it:

* ``fit_save_sec`` — offline: fit the coarse quantizer + residual
  codebooks on the (bounded) indexed corpus and persist the artifact;
* ``load_sec`` — reload the prefit from parquet (driver-resident numpy
  after this);
* ``probe_sec`` — ``ivf_dedup_batch`` of a FIXED daily batch against
  the corpus through the reloaded prefit: corpus cell assignment +
  cell-at-a-time cosine rescore (and, for the ``shortlist`` row, the
  ADC pre-rank bounding full-precision work).

The corpus is replicated id-shifted (content diversity fixed, volume
grows — the measure_incremental.py axis; replicas are exact duplicates
of their source, which is precisely what re-embedded re-crawled content
looks like), the batch stays fixed at 10x — the point-probe steady
state where the index dwarfs the daily increment.

Run: python tools/measure_emb_incremental.py [sf_dir] [reps...]
Writes EMB_INCREMENTAL_100X.json at the repo root.
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

from cdc_data_lake_pyspark_spark.operators.similarity import (  # noqa: E402
    fit_ivf_pq,
    ivf_dedup_batch,
    load_ivf_pq_prefit,
    save_ivf_pq_prefit,
)
from cdc_data_lake_pyspark_spark.session import build_session  # noqa: E402

BATCH_REP = 10


def _replicate(emb, rep):
    if rep == 1:
        return emb
    spark = emb.sparkSession
    return emb.crossJoin(
        spark.range(rep).select(F.col("id").alias("_r"))
    ).select(
        (F.col("vec_id") + F.col("_r") * 10_000_000).alias("vec_id"),
        "embedding",
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = [int(r) for r in sys.argv[2:]] or [1, 100]
    spark = build_session(app_name="emb-incremental-100x")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus_1x = emb.filter(F.col("vec_id") % 3 != 0)
    # the daily batch: NOVEL vectors (the %3==0 split) plus RE-EMBEDDED
    # corpus content (exact copies of half the corpus under fresh ids —
    # what a re-crawled-then-re-embedded document looks like); the
    # probe must drop the latter against the index
    novel = emb.filter(F.col("vec_id") % 3 == 0)
    redone = corpus_1x.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") + 1_000_000_000).alias("vec_id"), "embedding"
    )
    batch = _replicate(
        novel.unionByName(redone), BATCH_REP
    ).localCheckpoint()
    n_batch = batch.count()
    rows = []
    for rep in reps:
        corpus = _replicate(corpus_1x, rep).localCheckpoint()
        n_corpus = corpus.count()
        work = tempfile.mkdtemp(prefix="embx_")
        t0 = time.time()
        prefit = fit_ivf_pq(
            corpus, n_clusters=64, m_sub=8, k=16, seed=42
        )
        save_ivf_pq_prefit(spark, prefit, work)
        t1 = time.time()
        loaded = load_ivf_pq_prefit(spark, work)
        t2 = time.time()
        for label, shortlist in (("exact", None), ("adc_shortlist", 200)):
            t3 = time.time()
            n_pairs = ivf_dedup_batch(
                corpus,
                batch,
                loaded,
                threshold=0.9,
                n_probe=8,
                shortlist=shortlist,
            ).count()
            row = {
                "rep": rep,
                "mode": label,
                "n_corpus": n_corpus,
                "n_batch": n_batch,
                "fit_save_sec": round(t1 - t0, 2),
                "load_sec": round(t2 - t1, 2),
                "probe_sec": round(time.time() - t3, 2),
                "pairs": n_pairs,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        shutil.rmtree(work, ignore_errors=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "EMB_INCREMENTAL_100X.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "batch_rep": BATCH_REP, "rows": rows},
                  f, indent=1)
    print(json.dumps({"metric": "emb_incremental_100x", "points": len(rows)}))


if __name__ == "__main__":
    main()
