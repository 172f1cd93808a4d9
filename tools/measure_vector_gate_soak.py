"""Per-batch cost curve for StreamingVectorDedupGate — the vector twin
of tools/measure_gate_soak.py: stream N equal embedding micro-batches
through one gate and record each batch's wall while the encoded store
grows N×.

What this pins: per-batch cost must stay ~FLAT as the store grows —
the replay guard is a manifest lookup, the probe is a partition-pruned
scan of the batch's probed cells, and the fixture is worst-case for
candidate density (every batch vector is an exact re-embedding of
batch 0's copy, so per-vector candidates grow LINEARLY with batch
number; the emitted drop verdicts stay constant).

Run: python tools/measure_vector_gate_soak.py [sf_dir] [n_batches] [batch_vecs]
Writes VECTOR_GATE_SOAK.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdc_data_lake_pyspark_spark.operators.similarity import (  # noqa: E402
    fit_ivf_pq,
    save_ivf_pq_prefit,
)
from cdc_data_lake_pyspark_spark.session import build_session  # noqa: E402
from cdc_data_lake_pyspark_spark.streaming.vector_gate import (  # noqa: E402
    StreamingVectorDedupGate,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    batch_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    spark = build_session(app_name="vector-gate-soak")
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(batch_vecs)
        .localCheckpoint()
    )
    idx = tempfile.mkdtemp(prefix="vgate_soak_")
    save_ivf_pq_prefit(
        spark, fit_ivf_pq(emb, n_clusters=16, m_sub=8, k=16, seed=42), idx
    )
    gate = StreamingVectorDedupGate(idx, threshold=0.9, n_probe=4)
    walls, kept_per_batch = [], []
    for b in range(n_batches):
        # fresh ids, identical vectors: every batch-b vector is an exact
        # re-embedding of batch 0's copy — worst-case candidate density
        batch = emb.select(
            (F.col("vec_id") + b * 10_000_000).alias("vec_id"),
            "embedding",
        )
        t0 = time.time()
        gate.process_batch(batch, batch_id=b)
        walls.append(round(time.time() - t0, 2))
        print(json.dumps({"batch": b, "wall_sec": walls[-1]}), flush=True)
    kept = gate.kept_vectors(spark)
    by_batch = {
        r["batch_id"]: r["n"]
        for r in kept.groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept_per_batch = [int(by_batch.get(b, 0)) for b in range(n_batches)]
    # verdict sanity: batch 0 keeps its distinct vectors, every later
    # batch keeps none (all exact re-embeddings of seen content)
    assert kept_per_batch[0] > 0
    assert all(k == 0 for k in kept_per_batch[1:]), kept_per_batch
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "VECTOR_GATE_SOAK.json"), "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "batch_vecs": batch_vecs,
                "walls": walls,
                "kept_per_batch": kept_per_batch,
                "first3_mean": round(sum(walls[:3]) / 3, 2),
                "last3_mean": round(sum(walls[-3:]) / 3, 2),
            },
            f,
            indent=1,
        )
    print(json.dumps({"metric": "vector_gate_soak", "n": n_batches}))


if __name__ == "__main__":
    main()
