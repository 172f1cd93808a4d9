"""Incremental corpus-refresh capstone (queries_phase11.py): the
artifact lifecycle the oracle cannot see — after the entry runs, the
persisted index must have been UPDATED with day-1's accepted content,
so a DAY-2 probe finds both days without re-shingling anything."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.dedup_text import (
    load_minhash_index,
    minhash_probe,
)
from cdc_data_lake_pyspark_spark.queries_phase11 import (
    _prepare_web_corpus_incremental,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_day1_survivors_update_the_index_for_day2(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out = _prepare_web_corpus_incremental(docs, work_dir=str(tmp_path))
    rows = out.collect()
    day0 = {r.doc_id for r in rows if r.day == 0}
    day1 = {r.doc_id for r in rows if r.day == 1}
    assert day0 and day1  # non-degenerate on both days (the r12 lesson)
    index = load_minhash_index(spark, f"{tmp_path}/index")
    indexed = {r.doc_id for r in index.signatures.select("doc_id").collect()}
    # every kept keeper from BOTH days is probe-visible tomorrow
    assert day0 <= indexed and day1 <= indexed
    # a day-2 re-crawl of a day-1 survivor: rebuild its extracted text
    # through the same page/extraction templates and probe the RELOADED
    # index — it must hit its day-1 original (estimate 1.0)
    from cdc_data_lake_pyspark_spark.functions.html import main_text_sql
    from cdc_data_lake_pyspark_spark.queries_phase10 import BOILER
    from cdc_data_lake_pyspark_spark.queries_phase11 import (
        _DAY0_SQL,
        _SRC_SQL,
    )
    from cdc_data_lake_pyspark_spark.queries_phase9 import _PAGE_SQL

    target = min(day1)
    crawl = (
        docs.select(
            "doc_id",
            F.expr(_DAY0_SQL).alias("day"),
            F.expr(_SRC_SQL).alias("_src"),
        )
        .filter(F.col("doc_id") == target)
        .join(
            docs.select(F.col("doc_id").alias("_src"), "text"), "_src"
        )
        .select(
            "doc_id",
            F.when(
                F.col("_src") % 3 == 0,
                F.concat(F.lit(BOILER + " "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    day2 = crawl.select(
        F.lit(999_999_999).cast("long").alias("doc_id"),
        F.expr(main_text_sql(_PAGE_SQL, duck=False)).alias("text"),
    )
    hits = minhash_probe(day2, index, threshold=0.99).collect()
    assert any(r.index_id == target for r in hits), hits


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_daily_refresh_loop_soak_invariants(spark, tmp_path):
    """The N-day soak (VERDICT r12 #3, queries_phase11.daily_refresh_loop):
    over a 3-day run against persisted artifacts, every daily work type
    fires every day (frontier, probe, learned gate — the r12
    degeneracy lesson), day k's probe sees day k−1's keepers (no
    content fingerprint is ever kept twice across days), and a
    compacting twin produces IDENTICAL keepers with fewer index
    files."""
    from cdc_data_lake_pyspark_spark.queries_phase11 import (
        daily_refresh_loop,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    metrics: list = []
    out = daily_refresh_loop(
        docs, n_days=3, work_dir=str(tmp_path / "plain"),
        day_metrics=metrics,
    ).collect()
    by_day = {}
    for r in out:
        by_day.setdefault(r.day, set()).add(r.fingerprint)
    assert set(by_day) == {0, 1, 2}
    assert all(by_day[d] for d in by_day)  # keepers every day
    for m in metrics[1:]:  # every later day: all three gates fired
        assert m["frontier_drops"] > 0, m
        assert m["probe_drops"] > 0, m
        assert m["model_drops"] > 0, m
    # day-k-sees-day-(k−1): content kept once is NEVER kept again — the
    # estimate-1.0 probe hit against the appended keepers guarantees
    # cross-day fingerprint uniqueness
    all_fps = [r.fingerprint for r in out]
    assert len(all_fps) == len(set(all_fps))
    # compacting twin: identical keepers, fewer artifact files
    twin: list = []
    out2 = daily_refresh_loop(
        docs, n_days=3, work_dir=str(tmp_path / "compact"),
        compact_every=1, day_metrics=twin,
    ).collect()
    assert {(r.day, r.fingerprint) for r in out2} == {
        (r.day, r.fingerprint) for r in out
    }
    assert twin[-1]["signatures_files"] < metrics[-1]["signatures_files"] \
        or twin[-1]["buckets_files"] < metrics[-1]["buckets_files"]
    # host-stats sum-refold (VERDICT r13 #4): the compacting twin's
    # reputation store is bounded (days folded to one snapshot row-set)
    # while producing the identical keepers asserted above
    assert twin[-1]["hosts_files"] < metrics[-1]["hosts_files"]


def test_refold_host_stats_is_read_equivalent(spark, tmp_path):
    """VERDICT r13 #4: the host-stats store is per-day sufficient
    statistics — NOT distinct-compactable (two days with identical
    rows must both count).  The sum-refold rewrites days 0..k as one
    snapshot row per host; the gate's cumulative aggregate over the
    store must be IDENTICAL before and after, including for a host
    whose two days carried byte-identical rows."""
    from cdc_data_lake_pyspark_spark.queries_phase11 import (
        refold_host_stats,
    )

    hosts_dir = str(tmp_path / "hosts")
    day0 = spark.createDataFrame(
        [("a.com", 10, 8), ("b.com", 4, 4)],
        "_host string, _n bigint, _u bigint",
    )
    # day 1 repeats a.com's EXACT row — distinct would silently halve it
    day1 = spark.createDataFrame(
        [("a.com", 10, 8), ("c.com", 6, 5)],
        "_host string, _n bigint, _u bigint",
    )
    day0.write.mode("overwrite").parquet(hosts_dir)
    day1.write.mode("append").parquet(hosts_dir)

    def _agg():
        return {
            (r._host, r.n, r.u)
            for r in spark.read.parquet(hosts_dir)
            .groupBy("_host")
            .agg(F.sum("_n").alias("n"), F.sum("_u").alias("u"))
            .collect()
        }

    want = _agg()
    assert ("a.com", 20, 16) in want  # the duplicate-row day counted
    refold_host_stats(spark, hosts_dir)
    assert _agg() == want
    # folded: one row per host
    assert spark.read.parquet(hosts_dir).count() == 3
    # idempotent under repeated maintenance
    refold_host_stats(spark, hosts_dir)
    assert _agg() == want


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_multimodal_refresh_loop_soak_invariants(spark, tmp_path):
    """The MULTIMODAL N-day loop (VERDICT r13 #1,
    daily_refresh_loop(embeddings=...)): over a 3-day run, BOTH probe
    families fire every later day (text probe AND vector probe — the
    %16==7 paraphrase pool guarantees vector-specific work: fresh text,
    yesterday's embedding), the compacting twin produces IDENTICAL
    keepers, and compaction bounds the encoded store's file count."""
    from cdc_data_lake_pyspark_spark.queries_phase11 import (
        daily_refresh_loop,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    metrics: list = []
    out = daily_refresh_loop(
        docs, n_days=3, work_dir=str(tmp_path / "plain"),
        day_metrics=metrics, embeddings=emb,
    ).collect()
    assert {r.day for r in out} == {0, 1, 2}
    for m in metrics[1:]:
        assert m["probe_drops"] > 0, m
        assert m["vec_drops"] > 0, m  # the vector family really fired
        assert m["kept_rows"] > 0, m
    twin: list = []
    out2 = daily_refresh_loop(
        docs, n_days=3, work_dir=str(tmp_path / "compact"),
        compact_every=1, day_metrics=twin, embeddings=emb,
    ).collect()
    assert {(r.day, r.fingerprint) for r in out2} == {
        (r.day, r.fingerprint) for r in out
    }
    assert twin[-1]["vectors_files"] < metrics[-1]["vectors_files"]


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_failed_day1_append_does_not_leak_work_dir(spark, monkeypatch, tmp_path):
    """VERDICT r16 #8: on the registry path the work-dir rmtree rides in
    a finally, so a failing overlapped thunk (here: the day-1 index
    append) cannot leak the mkdtemp — and the failure leaves no partial
    state a convergent re-run would trip over."""
    import tempfile

    import cdc_data_lake_pyspark_spark.operators.dedup_text as dt

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    made: list[str] = []
    real_mkdtemp = tempfile.mkdtemp

    def tracking_mkdtemp(*args, **kwargs):
        d = real_mkdtemp(*args, **kwargs)
        made.append(d)
        return d

    monkeypatch.setattr(tempfile, "mkdtemp", tracking_mkdtemp)

    def boom(*args, **kwargs):
        raise RuntimeError("injected day-1 append failure")

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(dt, "append_to_minhash_index", boom)
        with pytest.raises(RuntimeError, match="injected day-1 append"):
            _prepare_web_corpus_incremental(docs)
    assert made, "registry path must mkdtemp its own work dir"
    assert not any(
        os.path.isdir(d) for d in made
    ), "failed overlap leaked a work dir"
    # convergent re-run: same entry, unpatched, succeeds end-to-end and
    # cleans up after itself again
    out = _prepare_web_corpus_incremental(docs)
    assert out.count() > 0
    assert not any(os.path.isdir(d) for d in made)
