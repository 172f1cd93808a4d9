"""Per-batch cost curve for StreamingNearDupGate (VERDICT r11 #2's
"measure the day-N cost curve" applied to the GATE itself): stream N
equal micro-batches through one gate and record each batch's wall.

What this pins: the replay guard is a manifest lookup (O(#batches)),
so per-batch cost must stay ~FLAT as the store grows — the pre-r12
id-level anti-join re-scanned the full signature store every batch,
which would show here as a rising tail.  Candidate discovery still
scans the bucket store per batch (inherent to LSH probing); its growth
tracks duplicate density, not corpus size, on this fixture.

Run: python tools/measure_gate_soak.py [sf_dir] [n_batches] [batch_docs]
Writes GATE_SOAK.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdc_data_lake_pyspark_spark.session import build_session  # noqa: E402
from cdc_data_lake_pyspark_spark.streaming.neardup import (  # noqa: E402
    StreamingNearDupGate,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    batch_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    spark = build_session(app_name="gate-soak")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull())
        .limit(batch_docs)
        .localCheckpoint()
    )
    gate = StreamingNearDupGate(
        tempfile.mkdtemp(prefix="gate_soak_"), threshold=0.8
    )
    walls = []
    for b in range(n_batches):
        # each batch: fresh ids, same text distribution (every doc is a
        # near-dup of batch 0's copy — worst-case candidate density)
        batch = docs.select(
            (F.col("doc_id") + b * 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" b{b}")).alias("text"),
        )
        t0 = time.time()
        gate.process_batch(batch, batch_id=b)
        walls.append(round(time.time() - t0, 2))
        print(json.dumps({"batch": b, "wall_sec": walls[-1]}), flush=True)
    out = {
        "sf_dir": sf_dir,
        "batch_docs": batch_docs,
        "walls": walls,
        "first3_mean": round(sum(walls[:3]) / 3, 2),
        "last3_mean": round(sum(walls[-3:]) / 3, 2),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "GATE_SOAK.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "gate_soak", "n": n_batches}))


if __name__ == "__main__":
    main()
