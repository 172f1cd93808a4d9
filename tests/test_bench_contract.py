"""bench.py contract: the driver tail-parses its final stdout line, so the
harness pieces it depends on must not drift."""

import json

import bench
from cdc_data_lake_pyspark_spark import queries as q


def test_headline_queries_all_registered():
    reg = q.queries()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert not missing, f"HEADLINE names not in registry: {missing}"


def test_prepared_fixtures_all_registered():
    reg = q.queries()
    assert set(q.BENCH_PREPARED) <= set(reg)


def test_summary_line_stays_tail_parseable():
    """The compact summary (aggregates + 10 headline timings) must stay
    well under the driver's tail-capture window even with worst-case
    float widths."""
    summary = {
        "core_headline_median_sec": 9999.999,
        "core_headline_min_sec": 9999.999,
        "core_headline_sec": 9999.999,
        "metric": "headline query wall time (sum)",
        "value": 9999.999,
        "unit": "sec",
        "queries": {n: 9999.999 for n in bench.HEADLINE},
        "sf": "0.1",
        "n_queries": len(q.queries()),
        "n_failed": 0,
        "failed": [],
        "flagship_events": 99_999_999,
        "flagship_events_per_sec": 9_999_999,
        "full_results": "BENCH_local.json",
    }
    assert len(json.dumps(summary)) < 1024


def test_core_is_frozen():
    """core_headline_sec is only meaningful if the 10-query core NEVER
    changes (VERDICT r6 #7: the round-over-round bench contract)."""
    assert bench.CORE == [
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
    reg = q.queries()
    assert all(n in reg for n in bench.CORE)


def test_core_median_fields_present_in_artifact():
    """VERDICT r9 #4: once bench.py has produced a local artifact, it
    must carry the noise-robust core fields and their arithmetic must
    reconstruct (median/min drawn from the recorded per-pass sums)."""
    import os
    import statistics

    import pytest as _pytest

    path = os.path.join(os.path.dirname(bench.__file__), "BENCH_local.json")
    if not os.path.exists(path):
        _pytest.skip("no local bench artifact yet")
    d = json.load(open(path))
    if "core_pass_sums" not in d:
        _pytest.skip("artifact predates the r10 median contract")
    sums = d["core_pass_sums"]
    # only COMPLETE passes enter; a clean run has all three, a run with
    # a transient core failure records fewer (visibly, never silently)
    assert d.get("core_complete_passes", len(sums)) == len(sums)
    assert 1 <= len(sums) <= 3, sums
    assert d["core_headline_median_sec"] == round(statistics.median(sums), 3)
    assert d["core_headline_min_sec"] == min(sums)
    assert set(d["core_query_medians"]) <= set(bench.MEDIAN_TRACKED)


def test_median_tracked_covers_core_capstones_and_expensive():
    """VERDICT r10 #5 + r13 #3: the full-pipeline web capstones AND the
    expensive non-headline entries ride the multi-pass median machinery
    (per-query medians for bench_compare), while the CORE pass-sum
    contract stays the frozen 10-query set."""
    assert bench.MEDIAN_TRACKED == bench.CORE + [
        "prepare_web_corpus_v3", "prepare_web_corpus_v4"
    ] + bench.EXPENSIVE_TRACKED
    assert "prepare_web_corpus_v3" in bench.HEADLINE
    assert "prepare_web_corpus_v4" in bench.HEADLINE
    # every tracked-expensive entry must exist in the registry, and the
    # r14 multimodal capstone must be among them
    reg = q.queries()
    assert all(n in reg for n in bench.EXPENSIVE_TRACKED)
    assert "prepare_multimodal_incremental" in bench.EXPENSIVE_TRACKED


def test_sentinel_contract():
    """VERDICT r13 #3: the contention sentinel's knobs exist and the
    artifact (once produced by the new harness) carries the flag."""
    import os

    import pytest as _pytest

    assert bench.SENTINEL_EVERY >= 1
    assert bench.SENTINEL_FLAG_RATIO > 1.0
    path = os.path.join(os.path.dirname(bench.__file__), "BENCH_local.json")
    if not os.path.exists(path):
        _pytest.skip("no local bench artifact yet")
    d = json.load(open(path))
    if "sentinel_sec" not in d:
        _pytest.skip("artifact predates the r14 sentinel contract")
    import statistics

    assert d["sentinel_base_sec"] == statistics.median(d["sentinel_sec"][:3])
    assert isinstance(d["contention_flagged"], bool)


def test_steal_sentinel_contract():
    """VERDICT r16 #3: the ADDITIVE multi-core steal sentinel — knobs
    exist, the probe really measures concurrent walls, and an artifact
    produced by the new harness carries the series WITHOUT touching the
    single-core sentinel's fields (trend continuity)."""
    import os

    import pytest as _pytest

    assert 1 <= bench.STEAL_PROBES <= 32
    assert bench.STEAL_FLAG_RATIO > 1.0
    # the probe subprocess prints a parseable wall
    walls = bench._steal_walls(2)
    assert len(walls) == 2 and all(w > 0 for w in walls)
    # ratio arithmetic: draw/base, guarded against a zero base
    assert bench.steal_draw(0.0) == 0.0
    path = os.path.join(os.path.dirname(bench.__file__), "BENCH_local.json")
    if not os.path.exists(path):
        _pytest.skip("no local bench artifact yet")
    d = json.load(open(path))
    if "steal_ratio_series" not in d:
        _pytest.skip("artifact predates the r17 steal-sentinel contract")
    series = d["steal_ratio_series"]
    assert series and all(r >= 0 for r in series)
    assert d["steal_ratio_max"] == max(series)
    assert d["steal_flagged"] == any(
        r > bench.STEAL_FLAG_RATIO for r in series
    )
    # additive: the single-core sentinel's contract fields are untouched
    assert "sentinel_sec" in d and "contention_flagged" in d


def _fake_sweep_state(flagged: bool) -> dict:
    return {
        "sf": "0.1",
        "queries": {},
        "errors": {},
        "done": False,
        "sentinel_sec": [0.1, 0.1, 0.1, 0.9 if flagged else 0.1],
        "sentinel_base_sec": 0.1,
        "contention_flagged": flagged,
        "steal_base_sec": 0.3,
        "steal_probes": 8,
        "steal_ratio_series": [1.02, 1.05],
        "steal_ratio_max": 1.05,
        "steal_flagged": False,
        "total": 1.0,
        "flagship_events": 0,
        "flagship_events_per_sec": None,
        "dataprep_docs": 0,
        "dataprep_docs_per_sec": None,
        "core_headline_sec": 1.0,
        "core_headline_median_sec": 1.0,
        "core_headline_min_sec": 1.0,
        "core_pass_sums": [1.0],
        "core_complete_passes": 1,
        "core_query_medians": {},
    }


def _run_main_with_fake_sweeps(monkeypatch, capsys, flags):
    """Drive bench.main() with run_sweep stubbed to return the given
    contention verdicts in order; return (n_sweeps, summary)."""
    calls = []

    def fake_run_sweep(*_a, **_k):
        calls.append(1)
        return _fake_sweep_state(flags[len(calls) - 1])

    class _SC:
        defaultParallelism = 4

        def setLogLevel(self, _):
            pass

    class _Spark:
        sparkContext = _SC()

    monkeypatch.setattr(bench, "run_sweep", fake_run_sweep)
    monkeypatch.setattr(bench, "build_session", lambda **k: _Spark())
    monkeypatch.setattr(bench, "tee_stderr", lambda p: None)
    monkeypatch.setattr(bench, "scan_warnings", lambda p: (0, []))
    monkeypatch.setattr(bench, "flush_partial", lambda s: None)
    monkeypatch.setattr(bench.q, "BENCH_PREPARED", {})
    monkeypatch.setattr(bench.q, "queries", lambda: {})
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return len(calls), json.loads(out)


def test_contention_flagged_sweep_is_retried_once(monkeypatch, capsys):
    """VERDICT r14 #2: a contention-flagged first sweep must not
    silently become the round artifact — main() re-runs the full sweep
    once and the summary records the retry."""
    n, summary = _run_main_with_fake_sweeps(
        monkeypatch, capsys, [True, False]
    )
    assert n == 2
    assert summary["contention_retried"] is True
    assert summary["contention_flagged"] is False


def test_clean_sweep_is_not_retried(monkeypatch, capsys):
    n, summary = _run_main_with_fake_sweeps(monkeypatch, capsys, [False])
    assert n == 1
    assert summary["contention_retried"] is False
    assert summary["contention_flagged"] is False


def test_double_flagged_run_ships_flagged(monkeypatch, capsys):
    """If the retry is flagged too, the artifact ships — but
    self-identifies as both flagged and retried (one retry only: the
    bounded-runtime contract protects the driver artifact)."""
    n, summary = _run_main_with_fake_sweeps(
        monkeypatch, capsys, [True, True]
    )
    assert n == 2
    assert summary["contention_retried"] is True
    assert summary["contention_flagged"] is True
