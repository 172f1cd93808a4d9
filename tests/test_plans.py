"""Physical-plan assertions: the optimizations SCALE.md claims must be
visible in the executed plan, not just intended."""

import pytest

from cdc_data_lake_pyspark_spark import queries as q


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def registry():
    return q.queries()


def test_route_filters_are_pushed_down(spark, sf_dir, registry):
    plan = _plan(registry["route_insert"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(props)" in plan or "In(event_type" in plan


def test_text_stats_prunes_to_needed_columns(spark, sf_dir, registry):
    plan = _plan(registry["text_stats"](spark, sf_dir))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_star_join_broadcasts_dimensions(spark, sf_dir, registry):
    plan = _plan(registry["join_customer_geo"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 2
    # the fact side never exchanges for the join itself
    assert "SortMergeJoin" not in plan


def test_dedup_max_by_partial_combines_map_side(spark, sf_dir, registry):
    """A2 as max_by aggregation: the scale property is MAP-SIDE partial
    combine (shuffle ≈ distinct keys per mapper).  The struct buffer makes
    Spark pick SortAggregate — documented in SCALE.md — but there must be
    a partial aggregate below the exchange, which the window variant
    fundamentally cannot have."""
    plan = _plan(registry["dedup_latest_per_key"](spark, sf_dir))
    partial, exchange = plan.index("partial_max_by"), plan.index("Exchange")
    assert partial > exchange  # plans print top-down: partial is below


def test_window_variant_shuffles_everything(spark, sf_dir):
    from cdc_data_lake_pyspark_spark.dedup import latest_change_per_key

    df = q._t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    plan = _plan(latest_change_per_key(df, ["user_id"], ["ts"], method="window"))
    assert "Sort " in plan and "row_number" in plan
    assert "partial" not in plan  # no pre-aggregation before the shuffle


def test_whole_stage_codegen_covers_agg_query(spark, sf_dir, registry):
    df = registry["agg_pricing_summary"](spark, sf_dir)
    df.collect()  # executes THIS queryExecution, finalizing the AQE plan
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark WholeStageCodegen spans; both aggregates and the
    # scan-filter-project pipeline must be inside one
    assert "*(1)" in plan and "*(2)" in plan


def test_merge_anti_join_broadcasts_small_update_side(spark, sf_dir, registry):
    df = registry["merge_upsert_customer"](spark, sf_dir)
    df.collect()  # let AQE pick the runtime join strategy
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_envelope_parse_not_duplicated_per_column(spark):
    """from_json must appear once per payload, not once per projected
    column (CollapseProject would re-parse 6x per row)."""
    from cdc_data_lake_pyspark_spark.envelope import parse_debezium

    env = spark.createDataFrame([('{"op":"c"}',)], "value string")
    plan = _plan(parse_debezium(env))
    # one parse for the envelope + one for the nested source struct
    assert plan.count("from_json") == 2


def test_web_corpus_v2_url_stage_precedes_extraction(spark, sf_dir, registry):
    """VERDICT r9 #6: in prepare_web_corpus_v2's optimized plan the
    map-only URL canonicalizer runs on a TEXT-FREE projection below the
    keeper semi-join, and the HTML extraction expression sits strictly
    ABOVE that semi-join — content work happens only on URL-dedup
    survivors."""
    plan = (
        registry["prepare_web_corpus_v2"](spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    lines = plan.splitlines()
    semi = [i for i, l in enumerate(lines) if "Join LeftSemi" in l]
    assert len(semi) == 1, f"expected one keeper semi-join: {semi}"
    extraction = [i for i, l in enumerate(lines) if "</title>" in l]
    assert extraction, "extraction template not found in plan"
    # tree dumps print parents first: extraction strictly above the semi
    assert all(i < semi[0] for i in extraction), (extraction, semi)
    # the canonicalizer's subtree never references the text column
    for i, l in enumerate(lines):
        if "HTTPS://Mi" in l and i > semi[0]:
            assert "text#" not in l, f"stage 0 carries text: {l[:200]}"


def test_web_corpus_v4_classifier_gate_is_broadcast_and_staged(
    spark, sf_dir, registry
):
    """prepare_web_corpus_v4's learned gate must ship the classifier's
    100 TB shape: the 65-row model reaches the scored corpus via
    BROADCAST joins (hash join for the bucket weights, nested-loop for
    the one-row bias — never a shuffled join), the keep verdict applies
    through a semi-join, and BOTH the extracted-survivor frame and the
    model are STAGED (LogicalRDD leaves), so extraction and training
    each run exactly once however many consumers read them.  The
    URL-before-extraction stage order itself is pinned on the shared
    machinery by test_web_corpus_v2_url_stage_precedes_extraction."""
    df = registry["prepare_web_corpus_v4"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    assert any("Join LeftSemi" in l for l in lines), "keep semi-join missing"
    # weight join + bias join both carry the broadcast hint
    hinted = [l for l in lines if "rightHint=(strategy=broadcast)" in l]
    assert len(hinted) >= 2, f"model joins not broadcast: {hinted}"
    # staging: extraction/training subtrees are checkpointed leaves — the
    # extraction template appears NOWHERE in the final plan because the
    # gated frame materialized once behind a LogicalRDD
    assert "</title>" not in plan
    assert any("LogicalRDD" in l for l in lines)
    phys = _plan(df)
    assert "BroadcastHashJoin" in phys


def test_web_corpus_incremental_output_is_fully_staged(
    spark, sf_dir, registry
):
    """The incremental capstone's RESIDUAL plan must be trivial: every
    heavy stage (crawl self-join, canonicalization, both extractions,
    the probe, both scorings, both dedups) runs EXACTLY ONCE while the
    body builds and persists the artifacts, so what the returned frame
    re-executes per action is only staged LogicalRDD leaves — since r13
    ONE eagerly-checkpointed leaf (the registry path materializes the
    two-day union before deleting its temp artifacts, ADVICE r12) —
    with no joins, no aggregation, and the extraction template absent.
    (The broadcast/semi-join shape of the scoring and probe machinery
    is pinned where the plans are visible: test_classifier.py's
    broadcast pin and the v4 pin above; staged frames hide their
    subtrees by design.)"""
    df = registry["prepare_web_corpus_incremental"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = [l for l in plan.splitlines() if l.strip()]
    assert 1 <= sum("LogicalRDD" in l for l in lines) <= 2, plan
    for heavy in ("Join", "Aggregate", "</title>", "Generate"):
        assert heavy not in plan, f"{heavy} re-executes per action"
    phys = _plan(df)
    assert "Scan ExistingRDD" in phys and "Exchange" not in phys


def test_multimodal_incremental_output_is_fully_staged(
    spark, sf_dir, registry
):
    """VERDICT r14 what's-wrong #3: prepare_multimodal_incremental has
    the same all-zero PLANS.md row as the web incremental (fully staged
    union — every heavy stage, both probe families, both appends run
    once in the body; the returned frame re-executes only staged
    leaves) but that discipline had no drift pin.  Same contract as
    test_web_corpus_incremental_output_is_fully_staged."""
    df = registry["prepare_multimodal_incremental"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = [l for l in plan.splitlines() if l.strip()]
    assert 1 <= sum("LogicalRDD" in l for l in lines) <= 2, plan
    for heavy in ("Join", "Aggregate", "Generate"):
        assert heavy not in plan, f"{heavy} re-executes per action"
    phys = _plan(df)
    assert "Scan ExistingRDD" in phys and "Exchange" not in phys
