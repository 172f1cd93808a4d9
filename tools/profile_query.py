"""Per-stage profile of one or more registry queries (guide §1/§7).

Runs each named query against ``$SPARK_GRAFT_SF_DIR`` (default sf0.1)
with the Spark event log enabled, materializes through the noop sink
(guide §1.4), and prints a per-query breakdown parsed from the event
log: job/stage wall times, task-time sums, shuffle read/write bytes,
spill, and the top stages by duration — the numbers the Spark UI would
show, recovered without a UI in the sandbox.

Usage::

    python tools/profile_query.py [--passes N] query [query ...]

The first pass is a warm-up at sf0.001 (JIT/codegen), mirroring
bench.py's methodology, so the profiled pass measures steady state.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_event_log(log_dir: str) -> dict:
    """Aggregate stage metrics from every event-log file in ``log_dir``."""
    stages: dict = {}
    jobs: dict = {}
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        for fn in files:
            if fn.startswith("events_") or fn.startswith("eventLog"):
                paths.append(os.path.join(root, fn))
        for fn in files:  # single-file (v1) logs: local-<appid>[.zstd]
            if fn.startswith("local-"):
                paths.append(os.path.join(root, fn))
    for path in paths:
        if path.endswith(".zstd"):
            continue  # no zstd reader in the sandbox; run uncompressed
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = (si["Stage ID"], si["Stage Attempt ID"])
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    entry = stages.setdefault(sid, {})
                    entry.update(
                        name=si.get("Stage Name", "")[:80],
                        tasks=si.get("Number of Tasks"),
                        wall_ms=(comp - sub) if sub and comp else None,
                    )
                elif kind == "SparkListenerTaskEnd":
                    sid = (ev["Stage ID"], ev["Stage Attempt ID"])
                    m = ev.get("Task Metrics") or {}
                    agg = stages.setdefault(sid, {}).setdefault(
                        "agg", defaultdict(int)
                    )
                    agg["task_ms"] += m.get("Executor Run Time", 0)
                    agg["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                    agg["gc_ms"] += m.get("JVM GC Time", 0)
                    agg["result_ser_ms"] += m.get("Result Serialization Time", 0)
                    agg["deser_ms"] += m.get("Executor Deserialize Time", 0)
                    sr = m.get("Shuffle Read Metrics") or {}
                    agg["shuffle_read_b"] += sr.get("Remote Bytes Read", 0) + sr.get(
                        "Local Bytes Read", 0
                    )
                    agg["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
                    sw = m.get("Shuffle Write Metrics") or {}
                    agg["shuffle_write_b"] += sw.get("Shuffle Bytes Written", 0)
                    agg["spill_mem_b"] += m.get("Memory Bytes Spilled", 0)
                    agg["spill_disk_b"] += m.get("Disk Bytes Spilled", 0)
                    inp = m.get("Input Metrics") or {}
                    agg["input_b"] += inp.get("Bytes Read", 0)
                elif kind == "SparkListenerJobStart":
                    jobs[ev["Job ID"]] = {
                        "t0": ev.get("Submission Time"),
                        "desc": (ev.get("Properties") or {}).get(
                            "spark.job.description", ""
                        ),
                        "stage_ids": [
                            si["Stage ID"]
                            for si in ev.get("Stage Infos", [])
                        ],
                    }
                elif kind == "SparkListenerJobEnd":
                    j = jobs.get(ev["Job ID"])
                    if j and j.get("t0"):
                        j["wall_ms"] = ev.get("Completion Time", 0) - j["t0"]
    return {"stages": stages, "jobs": jobs}


def report(tag: str, prof: dict, top: int = 14, desc_prefix: str | None = None) -> None:
    keep_stage_ids = None
    if desc_prefix is not None:
        keep_stage_ids = set()
        for j in prof["jobs"].values():
            if (j.get("desc") or "").startswith(desc_prefix):
                keep_stage_ids.update(j.get("stage_ids", []))
    stages = [
        (sid, s)
        for sid, s in prof["stages"].items()
        if s.get("wall_ms") is not None
        and (keep_stage_ids is None or sid[0] in keep_stage_ids)
    ]
    stages.sort(key=lambda kv: -(kv[1]["wall_ms"] or 0))
    total_wall = sum(s["wall_ms"] for _, s in stages)
    total_task = sum(s.get("agg", {}).get("task_ms", 0) for _, s in stages)
    print(f"\n=== {tag}: {len(stages)} stages, "
          f"sum stage wall {total_wall/1e3:.2f}s, sum task time {total_task/1e3:.2f}s")
    hdr = (
        f"{'stage':>7} {'wall_s':>7} {'task_s':>7} {'cpu_s':>6} {'gc_s':>5} "
        f"{'shR_MB':>7} {'shW_MB':>7} {'spill_MB':>8} {'in_MB':>7} {'tasks':>5}  name"
    )
    print(hdr)
    for sid, s in stages[:top]:
        a = s.get("agg", {})
        print(
            f"{sid[0]:>7} {s['wall_ms']/1e3:>7.2f} {a.get('task_ms',0)/1e3:>7.2f} "
            f"{a.get('cpu_ms',0)/1e3:>6.1f} {a.get('gc_ms',0)/1e3:>5.1f} "
            f"{a.get('shuffle_read_b',0)/1e6:>7.1f} {a.get('shuffle_write_b',0)/1e6:>7.1f} "
            f"{(a.get('spill_mem_b',0))/1e6:>8.1f} {a.get('input_b',0)/1e6:>7.1f} "
            f"{s.get('tasks') or 0:>5}  {s.get('name','')}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--passes", type=int, default=1,
                    help="timed materializations per query; reports "
                    "per-pass walls + min/median (noise-robust quiet-box "
                    "numbers; the event-log profile aggregates all passes)")
    ap.add_argument("--explain", action="store_true",
                    help="also print explain('formatted')")
    args = ap.parse_args()

    log_root = tempfile.mkdtemp(prefix="spark_events_")
    from cdc_data_lake_pyspark_spark.session import build_session

    spark = build_session(
        app_name="profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{log_root}",
            # plain JSON, single file: the sandbox has no zstd python
            # module to read the default rolling .zstd segments
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("WARN")
    from cdc_data_lake_pyspark_spark import queries as q

    registry = q.queries()
    prepared_env = {}
    for name in args.queries:
        if name in getattr(q, "BENCH_PREPARED", {}):
            prep, _ = q.BENCH_PREPARED[name]
            try:
                env = prep(spark, args.sf_dir)
                from pyspark.sql import DataFrame

                if isinstance(env, DataFrame):
                    par = spark.sparkContext.defaultParallelism
                    env = env.repartition(par).localCheckpoint()
                prepared_env[name] = env
            except Exception as exc:
                print(f"prepare({name}) failed: {exc!r}", file=sys.stderr)

    if not args.no_warm:
        for name in args.queries:
            try:
                registry[name](spark, "/root/testdata/sf0.001").write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception as exc:
                print(f"warmup({name}) failed: {exc!r}", file=sys.stderr)

    import statistics

    for name in args.queries:
        # one event-log application per query would need one session per
        # query; instead bracket by job description per query
        spark.sparkContext.setJobDescription(f"profile:{name}")
        walls = []
        df = None
        for _ in range(max(args.passes, 1)):
            t0 = time.time()
            if name in prepared_env:
                df = q.BENCH_PREPARED[name][1](spark, prepared_env[name])
            else:
                df = registry[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        summary = (
            f"wall {walls[0]:.3f}s"
            if len(walls) == 1
            else (
                f"walls {[round(w, 3) for w in walls]} "
                f"min {min(walls):.3f}s median {statistics.median(walls):.3f}s"
            )
        )
        print(f"\n##### {name}: {summary}")
        if args.explain:
            df.explain("formatted")
        spark.sparkContext.setJobDescription(None)

    spark.stop()
    time.sleep(1.0)
    prof = parse_event_log(log_root)
    for name in args.queries:
        report(name, prof, desc_prefix=f"profile:{name}")


if __name__ == "__main__":
    main()
