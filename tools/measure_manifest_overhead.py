"""Cost of the day-granularity exactly-once machinery (VERDICT r14 #5,
SCALE.md §26's 'constants, invisible at the 100x axis' claim, now
measured): run ``daily_refresh_loop`` for DAYS days on the sf corpus
replicated REP x, once with ``exactly_once=True`` (manifest + keepers
store + writer-day tags + own-day exclusions) and once with the legacy
``exactly_once=False`` restart-from-scratch shape, fresh session per
run (the r14 soak-isolation hygiene), and record per-day walls plus
keeper-set identity — the two modes must produce the SAME keepers, and
the per-day marginal delta is the discipline's price.

COUNTERBALANCED (legacy, eo, eo, legacy — two passes per mode): the
first sequential version of this tool read a phantom +30 %/day because
single-pass day walls at rep=100 swing ±20-40 % run to run (measured:
the same legacy day 0 read 73 s, 51 s, 45 s across three runs) and the
modes ran in a fixed order; interleaving cancels the drift and the
real delta is within the noise band.

Run: python tools/measure_manifest_overhead.py [sf_dir] [rep] [days]
Writes MANIFEST_OVERHEAD.json at the repo root.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    days = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    runs: dict = {"legacy": [], "exactly_once": []}
    for i, (label, exactly_once) in enumerate(
        (
            ("legacy", False),
            ("exactly_once", True),
            ("exactly_once", True),
            ("legacy", False),
        )
    ):
        spark = build_session(app_name=f"manifest-overhead-{label}-{i}")
        docs_1x = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        docs = (
            docs_1x
            if rep == 1
            else docs_1x.crossJoin(
                spark.range(rep).select(F.col("id").alias("_r"))
            ).select(
                (
                    F.col("doc_id") + F.col("_r") * 100_000_000_000
                ).alias("doc_id"),
                "text",
            )
        )
        metrics: list = []
        work = tempfile.mkdtemp(prefix=f"mover_{label}_")
        t0 = time.time()
        out = daily_refresh_loop(
            docs,
            n_days=days,
            work_dir=work,
            day_metrics=metrics,
            exactly_once=exactly_once,
        )
        kept = {
            (r["day"], r["fingerprint"])
            for r in out.select("day", "fingerprint").collect()
        }
        runs[label].append(
            {
                "total_wall_sec": round(time.time() - t0, 2),
                # a day skipped as already-manifested (reused work_dir)
                # has no wall_sec — exclude it rather than average None
                # (ADVICE r15)
                "day_walls": [
                    m["wall_sec"] for m in metrics if "wall_sec" in m
                ],
                "kept": sorted(kept),
            }
        )
        print(
            json.dumps(
                {
                    "run": f"{label}#{len(runs[label])}",
                    "total": runs[label][-1]["total_wall_sec"],
                    "day_walls": runs[label][-1]["day_walls"],
                    "n_kept": len(kept),
                }
            ),
            flush=True,
        )
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    kept_sets = [r["kept"] for rs in runs.values() for r in rs]
    assert all(k == kept_sets[0] for k in kept_sets), (
        "modes (or passes) disagree on the keepers"
    )

    def mode_mean(label: str) -> float:
        walls = [w for r in runs[label] for w in r["day_walls"]]
        return round(sum(walls) / len(walls), 2)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    summary = {
        "sf_dir": sf_dir,
        "rep": rep,
        "days": days,
        "keepers_identical": True,
        "n_kept": len(kept_sets[0]),
        "legacy_day_walls": [r["day_walls"] for r in runs["legacy"]],
        "exactly_once_day_walls": [
            r["day_walls"] for r in runs["exactly_once"]
        ],
        "legacy_day_mean_sec": mode_mean("legacy"),
        "exactly_once_day_mean_sec": mode_mean("exactly_once"),
    }
    with open(os.path.join(repo, "MANIFEST_OVERHEAD.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"metric": "manifest_overhead", "days": days}))


if __name__ == "__main__":
    main()
