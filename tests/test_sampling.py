"""Deterministic stratified sampling (operators/sampling.py)."""

from cdc_data_lake_pyspark_spark.operators.sampling import stratified_sample


def _docs(spark, n=2000):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_rates_within_tolerance(spark):
    docs = _docs(spark)
    out = stratified_sample(
        docs, {"en": 0.5, "de": 0.2}, default_fraction=0.05
    )
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    # ~667 docs per stratum; binomial 3-sigma tolerance
    assert abs(got.get("en", 0) - 0.5 * 667) < 60
    assert abs(got.get("de", 0) - 0.2 * 667) < 45
    assert abs(got.get("fr", 0) - 0.05 * 667) < 30


def test_unlisted_stratum_dropped_without_default(spark):
    docs = _docs(spark)
    out = stratified_sample(docs, {"en": 1.0})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert out.count() == docs.filter("lang = 'en'").count()


def test_layout_and_run_stable(spark):
    docs = _docs(spark, 500)
    pick = lambda df: sorted(r["doc_id"] for r in df.collect())
    a = pick(stratified_sample(docs, {"en": 0.3, "de": 0.7}, default_fraction=0.1))
    b = pick(stratified_sample(
        docs.repartition(11, "lang"), {"en": 0.3, "de": 0.7}, default_fraction=0.1
    ))
    assert a == b and len(a) > 0


def test_superset_property_when_rate_increases(spark):
    # raising a stratum's rate only ADDS rows — the audit property that
    # makes hash sampling monotonic (a ticket below 0.2 is below 0.4)
    docs = _docs(spark, 900)
    small = {r["doc_id"] for r in
             stratified_sample(docs, {"en": 0.2}, default_fraction=0.0).collect()}
    big = {r["doc_id"] for r in
           stratified_sample(docs, {"en": 0.4}, default_fraction=0.0).collect()}
    assert small <= big


def test_training_order_deterministic_and_contiguous(spark):
    """training_order: (shard, pos) is a pure row function — identical
    under different partitionings, shards bounded, per-shard positions
    contiguous from 1, and a different seed yields a different order of
    the same rows."""
    from pyspark.sql import functions as F

    from cdc_data_lake_pyspark_spark.operators.sampling import (
        training_order,
    )

    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("source"),
    )
    a = {
        r.doc_id: (r.shard, r.pos)
        for r in training_order(df, keep_cols=("source",)).collect()
    }
    b = {
        r.doc_id: (r.shard, r.pos)
        for r in training_order(
            df.repartition(7, "source"), keep_cols=("source",)
        ).collect()
    }
    assert a == b  # layout-independent
    assert len(a) == 400
    by_shard = {}
    for doc, (sh, pos) in a.items():
        assert 0 <= sh < 8
        by_shard.setdefault(sh, []).append(pos)
    for sh, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), sh
    c = {
        r.doc_id: (r.shard, r.pos)
        for r in training_order(df, seed="epoch-1").collect()
    }
    assert set(c) == set(a) and c != a  # new epoch, same rows, new order
