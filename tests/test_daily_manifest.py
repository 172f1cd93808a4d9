"""Day-granularity exactly-once for daily_refresh_loop (VERDICT r14
what's-missing #4 / next-round #5): the per-day manifest written last,
writer-day tags on every append, and own-day replay-leak exclusions
upgrade the loop from restart-from-scratch measurement harness to a
re-invocable daily job.  THE pin: a crash AFTER day k's appends but
BEFORE its manifest row, then a plain re-invocation, must converge to
the clean run's keepers — including the days after k, which read
stores carrying the folded duplicates."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.queries_phase11 import (
    daily_refresh_loop,
    refold_host_stats,
)

SF_DIR = "/root/testdata/sf0.001"

needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata absent"
)


def _tables(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return docs, emb


def _keepers(rows) -> set:
    return {(r.day, r.doc_id, r.fingerprint, r.n_urls) for r in rows}


@needs_data
def test_crash_after_appends_rerun_converges_multimodal(spark, tmp_path):
    """Crash day 1 after ALL of its appends (host stats, seen digests,
    index signatures+buckets, encoded vectors, keepers) with the
    manifest row unwritten; re-invoke the loop.  Day 0 skips
    (manifested), day 1 re-runs with its own writer tags excluded, day
    2 runs over stores carrying the folded duplicates — final keepers
    must equal the clean run's, both probe families still firing."""
    docs, emb = _tables(spark)
    clean_metrics: list = []
    clean = _keepers(
        daily_refresh_loop(
            docs,
            n_days=3,
            work_dir=str(tmp_path / "clean"),
            day_metrics=clean_metrics,
            embeddings=emb,
        ).collect()
    )

    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected crash"):
        daily_refresh_loop(
            docs,
            n_days=3,
            work_dir=crash_dir,
            embeddings=emb,
            _crash_after_appends_on_day=1,
        )
    # non-vacuous: the dead attempt's appends really landed, tagged
    leaked_sigs = (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{crash_dir}/index/signatures")
        .filter(F.col("batch_id") == 1)
    )
    assert not leaked_sigs.isEmpty()
    leaked_enc = (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{crash_dir}/vectors/encoded")
        .filter(F.col("batch_id") == 1)
    )
    assert not leaked_enc.isEmpty()
    # ...and day 1 is NOT manifested while day 0 is
    manifested = {
        r[0]
        for r in spark.read.schema("_day INT")
        .parquet(f"{crash_dir}/days")
        .collect()
    }
    assert manifested == {0}

    resumed_metrics: list = []
    resumed = _keepers(
        daily_refresh_loop(
            docs,
            n_days=3,
            work_dir=crash_dir,
            day_metrics=resumed_metrics,
            embeddings=emb,
        ).collect()
    )
    assert resumed == clean
    # day 0 skipped, days 1-2 executed with both probe families firing
    assert resumed_metrics[0] == {"day": 0, "skipped": True}
    for m in resumed_metrics[1:]:
        assert m["probe_drops"] > 0, m
        assert m["vec_drops"] > 0, m
        assert m["kept_rows"] > 0, m
    # the re-run's per-day keeper counts match the clean run's
    clean_kept = {m["day"]: m["kept_rows"] for m in clean_metrics}
    for m in resumed_metrics[1:]:
        assert m["kept_rows"] == clean_kept[m["day"]], m


@needs_data
def test_manifested_run_is_idempotent_and_skips(spark, tmp_path):
    """Re-invoking a fully-manifested loop skips every day and returns
    the identical keeper set from the persisted store."""
    docs, _ = _tables(spark)
    wdir = str(tmp_path / "w")
    first = _keepers(
        daily_refresh_loop(docs, n_days=2, work_dir=wdir).collect()
    )
    again_metrics: list = []
    again = _keepers(
        daily_refresh_loop(
            docs, n_days=2, work_dir=wdir, day_metrics=again_metrics
        ).collect()
    )
    assert again == first
    assert again_metrics == [
        {"day": 0, "skipped": True},
        {"day": 1, "skipped": True},
    ]


@needs_data
def test_manifested_work_dir_refuses_different_input(spark, tmp_path):
    """ADVICE r15: skipping a manifested day is only sound if the
    input frame is the one that wrote the manifest — every manifest
    row carries an input fingerprint, and a re-invocation over the
    same work_dir with a DIFFERENT input must raise, not silently
    return day-0 keepers computed from data the caller no longer has."""
    docs, _ = _tables(spark)
    wdir = str(tmp_path / "w")
    daily_refresh_loop(docs, n_days=2, work_dir=wdir).count()
    with pytest.raises(ValueError, match="DIFFERENT input"):
        daily_refresh_loop(
            docs.filter(F.col("doc_id") % 3 != 0),
            n_days=2,
            work_dir=wdir,
        )
    # the original input still re-invokes cleanly (fingerprint matches)
    again = daily_refresh_loop(docs, n_days=2, work_dir=wdir)
    assert again.count() > 0


def test_refold_host_stats_day_tagged_folds_leaks_not_days(
    spark, tmp_path
):
    """The day-tagged refold: a crash-rerun's byte-identical re-append
    (same _day) folds to ONE copy, while two legitimate days with
    identical stats (different _day) BOTH count; the snapshot lands
    under _day NULL, which every later own-day exclusion keeps."""
    hosts_dir = str(tmp_path / "hosts")
    day0 = spark.createDataFrame(
        [("a.com", 10, 8, 0), ("b.com", 4, 4, 0)],
        "_host string, _n bigint, _u bigint, _day int",
    )
    day1 = spark.createDataFrame(
        [("a.com", 10, 8, 1), ("c.com", 6, 5, 1)],
        "_host string, _n bigint, _u bigint, _day int",
    )
    day0.write.mode("overwrite").parquet(hosts_dir)
    day1.write.mode("append").parquet(hosts_dir)
    # the leak: day 1's identical row set appended twice (crash-rerun)
    day1.write.mode("append").parquet(hosts_dir)

    def _agg():
        df = spark.read.parquet(hosts_dir)
        if "_day" in df.columns:
            df = df.distinct()
        return {
            (r._host, r.n, r.u)
            for r in df.groupBy("_host")
            .agg(F.sum("_n").alias("n"), F.sum("_u").alias("u"))
            .collect()
        }

    want = {("a.com", 20, 16), ("b.com", 4, 4), ("c.com", 6, 5)}
    assert _agg() == want  # leak folded by the _day-scoped distinct
    refold_host_stats(spark, hosts_dir, day_tagged=True)
    assert _agg() == want
    rows = spark.read.parquet(hosts_dir).collect()
    assert len(rows) == 3
    assert all(r._day is None for r in rows)
    refold_host_stats(spark, hosts_dir, day_tagged=True)  # idempotent
    assert _agg() == want
