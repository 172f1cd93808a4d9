"""100x axis for the incremental corpus-refresh capstone (VERDICT r11
#3): what does DAY 1 cost, marginally, once day 0's artifacts exist?

Runs the SHIPPED composite body
(`queries_phase11._prepare_web_corpus_incremental`) on the sf corpus
replicated Nx and splits the wall into:

* ``day0_bootstrap_sec`` — start → the body's ``day0_done`` timing
  checkpoint: host/URL gates, extraction, NB training, model + index
  persistence and reload (day-0's corpus materializes inside the index
  save);
* ``day1_marginal_sec`` — ``day0_done`` → ``day1_done``: frontier
  anti-join + extraction + probe against the RELOADED index + scoring
  under the RELOADED model + the day-1 index UPDATE appends.  This is
  the number a daily pipeline pays per crawl batch;
* ``output_sec`` — materializing the final two-day union (the residual
  dedup aggregates over already-staged survivors).

Run: python tools/measure_incremental.py [sf_dir] [reps...]
Writes INCREMENTAL_100X.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdc_data_lake_pyspark_spark.queries_phase11 import (  # noqa: E402
    _prepare_web_corpus_incremental,
)
from cdc_data_lake_pyspark_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = [int(r) for r in sys.argv[2:]] or [1, 100]
    spark = build_session(app_name="incremental-100x")
    docs_1x = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = []
    for rep in reps:
        if rep == 1:
            docs = docs_1x
        else:
            # id-shifted replication: residues mod 100/5/2 are preserved
            # (1e7 ≡ 0), so the fixture's source/host/URL structure is
            # size-invariant while crawl volume grows rep×
            docs = docs_1x.crossJoin(
                spark.range(rep).select(F.col("id").alias("_r"))
            ).select(
                (F.col("doc_id") + F.col("_r") * 10_000_000).alias(
                    "doc_id"
                ),
                "text",
            )
        import shutil
        import tempfile

        marks: dict = {}
        work = tempfile.mkdtemp(prefix="incr100x_")
        t0 = time.time()
        out = _prepare_web_corpus_incremental(
            docs, work_dir=work, timings=marks
        )
        t1 = time.time()
        d0 = out.filter(F.col("day") == 0).count()
        d1 = out.filter(F.col("day") == 1).count()
        t2 = time.time()
        shutil.rmtree(work, ignore_errors=True)
        row = {
            "rep": rep,
            "day0_bootstrap_sec": round(marks["day0_done"] - t0, 2),
            "day1_marginal_sec": round(marks["day1_done"] - marks["day0_done"], 2),
            "output_sec": round(t2 - t1, 2),
            "day0_rows": d0,
            "day1_rows": d1,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "INCREMENTAL_100X.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "rows": rows}, f, indent=1)
    print(json.dumps({"metric": "incremental_100x", "points": len(rows)}))


if __name__ == "__main__":
    main()
