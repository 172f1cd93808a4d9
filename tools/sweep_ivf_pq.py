"""Locate the IVF-PQ (n_probe, shortlist) knee at the 100x axis under
8-bit books (VERDICT r7 next-round #1).

The r7 §10 sweep that set the 4x-sqrt probe budget and the 2·sqrt(N)
shortlist predates the 8-bit codebooks — lower ADC noise may let a
SMALLER probe/shortlist budget reach the same recall.  This tool re-runs
the grid with `auto_pq_codes` active (256 codes at 200k vectors) on the
persisted 100x embeddings, computing the brute-force ground truth ONCE
and reusing it across every grid point.

Per point it records:
  - fit_sec   — driver-side structure build (sample collect + k-means +
                codebooks + probe selection), constant per layout
  - search_sec — the distributed encode/probe/ADC/re-rank job
  - recall_at_3 vs the shared exact set

Usage::

    python tools/sweep_ivf_pq.py [--out SWEEP_IVF_PQ.json] \
        [--probes 42,84,126,168] [--shortlists 100,400,894]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

EMB_100X = "/tmp/spark_graft_scale/embeddings_x100.parquet"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SWEEP_IVF_PQ.json")
    ap.add_argument("--probes", default="42,84,126,168")
    ap.add_argument("--shortlists", default="100,400,894")
    ap.add_argument("--emb", default=EMB_100X)
    args = ap.parse_args()

    from cdc_data_lake_pyspark_spark.operators.similarity import (
        auto_ivf_params,
        auto_pq_codes,
        brute_force_top_k,
        fit_ivf_pq,
        ivf_pq_top_k,
    )
    from cdc_data_lake_pyspark_spark.session import build_session

    spark = build_session()
    emb = spark.read.parquet(args.emb).select("vec_id", "embedding")
    n_vec = emb.count()
    nlist, auto_probe = auto_ivf_params(n_vec)
    n_codes = auto_pq_codes(n_vec)
    qs = emb.filter(F.col("vec_id") % 500 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_q = qs.count()

    # train ONCE (the layout is identical across every grid point — only
    # search-time parameters vary), search many via prefit
    t0 = time.time()
    prefit = fit_ivf_pq(emb, n_clusters=nlist, k=n_codes)
    fit_once_sec = round(time.time() - t0, 2)
    print(f"fit: nlist={nlist} n_codes={n_codes} {fit_once_sec}s", flush=True)

    t0 = time.time()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_top_k(emb, qs, k=3, exclude_self=True).collect()
    }
    exact_sec = round(time.time() - t0, 2)
    print(
        f"exact baseline: {n_q} queries over {n_vec} vectors, "
        f"{exact_sec}s, {len(exact)} pairs",
        flush=True,
    )

    out = {
        "n_vectors": n_vec,
        "n_queries": n_q,
        "n_clusters": nlist,
        "n_codes": n_codes,
        "auto_n_probe": auto_probe,
        "fit_once_sec": fit_once_sec,
        "exact_sec": exact_sec,
        "points": [],
    }
    probes = [int(x) for x in args.probes.split(",")]
    shortlists = [int(x) for x in args.shortlists.split(",")]
    for n_probe in probes:
        for shortlist in shortlists:
            t0 = time.time()
            df = ivf_pq_top_k(
                emb,
                qs,
                k=3,
                n_clusters=nlist,
                n_probe=n_probe,
                shortlist=shortlist,
                exclude_self=True,
                prefit=prefit,
            )
            got = {(r.query_id, r.neighbor_id) for r in df.collect()}
            search_sec = round(time.time() - t0, 2)
            point = {
                "n_probe": n_probe,
                "shortlist": shortlist,
                "search_sec": search_sec,
                "recall_at_3": round(len(exact & got) / len(exact), 4),
            }
            out["points"].append(point)
            print("sweep", point, flush=True)
            with open(args.out, "w") as fh:
                json.dump(out, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
