"""Round-over-round bench comparison: print a table of headline timings
and throughput figures across every BENCH_r*.json plus the current
BENCH_local.json.  Usage::

    python tools/bench_compare.py
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    try:
        with open(path) as f:
            d = json.load(f)
    except Exception:
        return None
    # driver artifacts wrap the bench line: {"rc", "tail", "parsed"};
    # accept the raw bench dict, the driver wrapper, or the local file
    # (whose per-query map lives under "timings")
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d and isinstance(d.get("timings"), dict):
        d = {**d, "queries": d["timings"]}
    return d if isinstance(d, dict) and "queries" in d else None


def main():
    rounds = []
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        d = load(path)
        if d:
            rounds.append((os.path.basename(path)[:-5], d))
    local = load(os.path.join(ROOT, "BENCH_local.json"))
    if local:
        rounds.append(("local", local))
    if not rounds:
        print("no parseable bench artifacts")
        return
    heads = sorted({k for _, d in rounds for k in d.get("queries", {})})
    print("| query/metric | " + " | ".join(n for n, _ in rounds) + " |")
    print("|---" * (len(rounds) + 1) + "|")
    for h in heads:
        cells = [
            (f"{d['queries'][h]:.2f}" if h in d.get("queries", {}) else "—")
            for _, d in rounds
        ]
        print(f"| {h} (s) | " + " | ".join(cells) + " |")
    for metric in ("flagship_events_per_sec", "dataprep_docs_per_sec",
                   "n_queries", "n_failed"):
        cells = [str(d.get(metric, "—")) for _, d in rounds]
        print(f"| {metric} | " + " | ".join(cells) + " |")

    # the bench CONTRACT numbers: the noise-robust median-of-three core
    # (r10+) and the legacy sum-of-mins core, with the round-over-round
    # delta vs the previous artifact that has one
    medians = [(n, d.get("core_headline_median_sec")) for n, d in rounds]
    if any(isinstance(c, (int, float)) for _, c in medians):
        cells = [f"{c:.3f}" if isinstance(c, (int, float)) else "—"
                 for _, c in medians]
        print("| core_headline_median_sec | " + " | ".join(cells) + " |")
        deltas, prev = [], None
        for _, c in medians:
            if isinstance(c, (int, float)) and isinstance(prev, (int, float)):
                deltas.append(f"{100.0 * (c - prev) / prev:+.1f}%")
            else:
                deltas.append("—")
            if isinstance(c, (int, float)):
                prev = c
        print("| core median Δ vs prev | " + " | ".join(deltas) + " |")
    cores = [
        (n, d.get("core_headline_sec")) for n, d in rounds
    ]
    cells = [f"{c:.3f}" if isinstance(c, (int, float)) else "—"
             for _, c in cores]
    print("| core_headline_sec | " + " | ".join(cells) + " |")
    deltas, prev = [], None
    for _, c in cores:
        if isinstance(c, (int, float)) and isinstance(prev, (int, float)):
            deltas.append(f"{100.0 * (c - prev) / prev:+.1f}%")
        else:
            deltas.append("—")
        if isinstance(c, (int, float)):
            prev = c
    print("| core Δ vs prev round | " + " | ".join(deltas) + " |")


if __name__ == "__main__":
    main()
