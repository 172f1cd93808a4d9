"""N-day soak of the daily corpus-refresh loop (VERDICT r12 #3): run
``queries_phase11.daily_refresh_loop`` for DAYS days on the sf corpus
replicated REP× and record, per day: wall, phase drop counts, kept
rows, and index-artifact file counts — once without compaction and once
compacting every other day.  The claim under measurement is the one a
100 TB operator needs proven: the daily marginal cost stays FLAT as the
persisted artifacts grow day over day, and compaction bounds the
store's file count without changing a single verdict.

With ``--multimodal`` (VERDICT r13 #1) the loop also carries the
VECTOR family — the encoded-corpus IVF store bootstrapped day 0,
probed by every later day's text-probe survivors, appended and
compacted alongside the text artifacts — and the per-day assertions
require BOTH probe families non-degenerate.  Writes
MULTIMODAL_SOAK.json instead.

Run: python tools/measure_daily_soak.py [sf_dir] [rep] [days] [--multimodal]
Writes SOAK_DAILY.json (or MULTIMODAL_SOAK.json) at the repo root.
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

from cdc_data_lake_pyspark_spark.queries_phase11 import (  # noqa: E402
    daily_refresh_loop,
)
from cdc_data_lake_pyspark_spark.session import build_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--multimodal"]
    multimodal = "--multimodal" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    rep = int(args[1]) if len(args) > 1 else 100
    days = int(args[2]) if len(args) > 2 else 7
    runs = {}
    for label, compact_every in (("plain", 0), ("compacting", 2)):
        # FRESH session per run (r14 measurement hygiene): a 7-day loop
        # accumulates ~1.5k stages of listener/UI/checkpoint-block
        # state, and the run that goes SECOND in a shared session pays
        # it as a spurious upward wall trend — the contention-vs-
        # regression confusion the bench sentinel exists to catch,
        # removed at the source so the two runs' walls are comparable.
        spark = build_session(app_name=f"daily-soak-{label}")
        docs_1x = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        # the embedding table is NOT replicated: the fixture's _vec
        # mapping is content-source-keyed (ids < 500 at every SF), so
        # replicas of the same content correctly share one embedding
        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
                "vec_id", "embedding"
            )
            if multimodal
            else None
        )
        if rep == 1:
            docs = docs_1x
        else:
            # id-shifted replication (the measure_incremental.py axis):
            # 1e7 ≡ 0 mod the fixture residues, so structure is
            # size-invariant while daily crawl volume grows rep×.  The
            # per-day shift inside the loop is also 1e7 — disambiguate
            # the replicas with a 1e11 stride so ids never collide
            # across (replica, day).
            docs = docs_1x.crossJoin(
                spark.range(rep).select(F.col("id").alias("_r"))
            ).select(
                (F.col("doc_id") + F.col("_r") * 100_000_000_000).alias(
                    "doc_id"
                ),
                "text",
            )
        metrics: list = []
        work = tempfile.mkdtemp(prefix=f"soak_{label}_")
        t0 = time.time()
        out = daily_refresh_loop(
            docs,
            n_days=days,
            work_dir=work,
            compact_every=compact_every,
            day_metrics=metrics,
            embeddings=emb,
        )
        kept = {
            (r["day"], r["fingerprint"])
            for r in out.select("day", "fingerprint").collect()
        }
        wall = round(time.time() - t0, 2)
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
        for m in metrics:
            print(json.dumps({"run": label, **m}), flush=True)
        # per-day NON-degeneracy (the r12 lesson): every gate fires daily
        gates = ["frontier_drops", "probe_drops", "model_drops"]
        if multimodal:
            gates.append("vec_drops")  # BOTH probe families, every day
        for m in metrics[1:]:
            for key in gates:
                assert m[key] > 0, (label, m)
            assert m["kept_rows"] > 0, (label, m)
        runs[label] = {
            "compact_every": compact_every,
            "total_wall_sec": wall,
            "days": metrics,
            "kept": sorted(kept)[:0],  # kept set only compared below
            "_kept_set": kept,
        }
    assert runs["plain"]["_kept_set"] == runs["compacting"]["_kept_set"], (
        "compaction changed verdicts"
    )
    for r in runs.values():
        r["kept_total"] = len(r.pop("_kept_set"))
        r.pop("kept")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_name = "MULTIMODAL_SOAK.json" if multimodal else "SOAK_DAILY.json"
    with open(os.path.join(repo, out_name), "w") as f:
        json.dump({"sf_dir": sf_dir, "rep": rep, "n_days": days,
                   "multimodal": multimodal, "runs": runs}, f, indent=1)
    print(json.dumps({"metric": "daily_soak", "days": days, "rep": rep,
                      "multimodal": multimodal}))


if __name__ == "__main__":
    main()
