"""Portable HLL sketch (functions/sketch.py)."""

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.functions.sketch import hll_estimate, hll_sketch


def _estimates(df):
    return {
        r["g"]: hll_estimate(r["m"], r["v_empty"], r["sum_pow"])
        for r in df.collect()
    }


def test_estimate_within_hll_error_bound(spark):
    # ~2857 distinct values per group: harmonic-mean regime for m=256
    # (relative std error 1.04/sqrt(256) = 6.5%; assert 4 sigma)
    df = spark.range(20000).select(
        (F.col("id") % 7).cast("string").alias("g"), F.col("id").alias("v")
    )
    got = _estimates(hll_sketch(df, "v", ["g"]))
    for g, est in got.items():
        true = len([i for i in range(20000) if i % 7 == int(g)])
        assert abs(est - true) / true < 0.26, (g, est, true)


def test_small_cardinality_uses_linear_counting(spark):
    # 40 distinct « m=256: linear counting is near-exact
    df = spark.range(40).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    est = _estimates(hll_sketch(df, "v", ["g"]))["a"]
    assert abs(est - 40) < 3


def test_sketch_state_layout_independent(spark):
    df = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v")
    )
    rows = lambda d: sorted(
        (r["g"], r["m"], r["v_empty"], r["sum_pow"]) for r in d.collect()
    )
    assert rows(hll_sketch(df, "v", ["g"])) == rows(
        hll_sketch(df.repartition(17, "v"), "v", ["g"])
    )


def test_duplicates_do_not_move_the_sketch(spark):
    base = spark.range(1000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    doubled = base.unionAll(base)
    rows = lambda d: sorted(
        (r["g"], r["m"], r["v_empty"], r["sum_pow"]) for r in d.collect()
    )
    assert rows(hll_sketch(base, "v", ["g"])) == rows(hll_sketch(doubled, "v", ["g"]))


def test_cms_point_estimates_upper_bound_and_accuracy(spark):
    from cdc_data_lake_pyspark_spark.functions.sketch import (
        cms_estimate,
        cms_sketch,
    )

    # skewed stream: value "hot" 500 times, 200 singletons
    rows = [("hot",)] * 500 + [(f"v{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string")
    state = {
        (r["hash_row"], r["bucket"]): r["n"]
        for r in cms_sketch(df, "v").collect()
    }
    est_hot = cms_estimate(state, "hot")
    assert est_hot >= 500                 # CMS never underestimates
    assert est_hot <= 500 + 700 // 64     # and collisions stay bounded
    for v in ("v0", "v1", "v199"):
        e = cms_estimate(state, v)
        assert 1 <= e <= 1 + 700 // 64


def test_cms_merges_by_cell_sum(spark):
    from pyspark.sql import functions as F

    from cdc_data_lake_pyspark_spark.functions.sketch import cms_sketch

    a = spark.createDataFrame([(f"x{i % 50}",) for i in range(300)], "v string")
    b = spark.createDataFrame([(f"x{i % 80}",) for i in range(200)], "v string")
    whole = {
        (r["hash_row"], r["bucket"]): r["n"]
        for r in cms_sketch(a.unionAll(b), "v").collect()
    }
    merged = {
        (r["hash_row"], r["bucket"]): r["n"]
        for r in cms_sketch(a, "v")
        .unionAll(cms_sketch(b, "v"))
        .groupBy("hash_row", "bucket")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert whole == merged


def test_bloom_no_false_negatives_and_absent_detection(spark):
    from cdc_data_lake_pyspark_spark.functions.sketch import (
        bloom_probe,
        bloom_sketch,
    )

    corpus = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(200)], "v string"
    )
    state = bloom_sketch(corpus, "v")
    # every corpus member must probe as maybe_seen (no false negatives)
    members = corpus.withColumnRenamed("v", "fp").withColumn(
        "id", F.col("fp")
    )
    got = bloom_probe(state, members, "fp", ["id"]).collect()
    assert len(got) == 200
    assert all(r["maybe_seen"] and r["n_hits"] == 4 for r in got)
    # with 200*4 cells in 8192 bits, unseen values are overwhelmingly
    # detected absent; assert the planted novels all miss >=1 position
    novels = spark.createDataFrame(
        [(f"novel-{i}", f"novel-{i}") for i in range(50)], "id string, fp string"
    )
    nv = bloom_probe(state, novels, "fp", ["id"]).collect()
    assert sum(1 for r in nv if not r["maybe_seen"]) >= 48


def test_bloom_merges_by_cell_union(spark):
    from cdc_data_lake_pyspark_spark.functions.sketch import bloom_sketch

    a = spark.createDataFrame([(f"a{i}",) for i in range(80)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(60)], "v string")
    whole = {
        (r["hash_row"], r["bit"])
        for r in bloom_sketch(a.unionAll(b), "v").collect()
    }
    merged = {
        (r["hash_row"], r["bit"])
        for r in bloom_sketch(a, "v")
        .unionAll(bloom_sketch(b, "v"))
        .distinct()
        .collect()
    }
    assert whole == merged


def test_histogram_quantile_error_bounded_by_bucket_width(spark):
    from cdc_data_lake_pyspark_spark.functions.sketch import (
        histogram_quantile,
        histogram_sketch,
    )

    vals = [float(7 * i % 1000) for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    cells = {
        r["bucket"]: r["n"]
        for r in histogram_sketch(df, "v", width=50.0, n_buckets=20).collect()
    }
    import statistics

    for q in (0.1, 0.5, 0.9):
        exact = statistics.quantiles(vals, n=100)[int(q * 100) - 1]
        est = histogram_quantile(cells, q, width=50.0)
        assert abs(est - exact) <= 50.0 + 1e-9


def test_histogram_merges_by_cell_sum(spark):
    from pyspark.sql import functions as F2

    from cdc_data_lake_pyspark_spark.functions.sketch import histogram_sketch

    a = spark.createDataFrame([(float(i % 400),) for i in range(300)], "v double")
    b = spark.createDataFrame([(float(i % 900),) for i in range(500)], "v double")
    whole = {
        (r["bucket"], r["n"])
        for r in histogram_sketch(a.unionAll(b), "v", width=50.0).collect()
    }
    merged = {
        (r["bucket"], r["n"])
        for r in histogram_sketch(a, "v", width=50.0)
        .unionAll(histogram_sketch(b, "v", width=50.0))
        .groupBy("bucket")
        .agg(F2.sum("n").alias("n"))
        .collect()
    }
    assert whole == merged


# ---------------------------------------------------------------- KMV
def test_kmv_estimates_distinct_and_join_overlap(spark):
    from pyspark.sql import Row
    import pyspark.sql.functions as SF

    from cdc_data_lake_pyspark_spark.functions.sketch import kmv_sketch

    # A = 0..3999, B = 2000..5999: |A|=|B|=4000, |A∪B|=6000, J=1/3
    a = spark.createDataFrame([Row(k=i) for i in range(4000)])
    b = spark.createDataFrame([Row(k=i) for i in range(2000, 6000)])
    ka, kb = kmv_sketch(a, "k", k=256), kmv_sketch(b, "k", k=256)
    assert ka.count() == 256 and kb.count() == 256
    ku = ka.unionAll(kb).distinct().orderBy("hv").limit(256)
    rows = ku.collect()
    kth = max(r.hv for r in rows)
    est_union = 255 * float(2**60) / kth
    assert 0.75 * 6000 < est_union < 1.25 * 6000  # ~1/sqrt(k) rel. error
    sa = {r.hv for r in ka.collect()}
    sb = {r.hv for r in kb.collect()}
    overlap = sum(1 for r in rows if r.hv in sa and r.hv in sb)
    est_j = overlap / 256
    assert 0.2 < est_j < 0.5  # true Jaccard 1/3
    # sketch of the union equals the merge of the sketches (mergeability)
    direct = kmv_sketch(a.unionAll(b), "k", k=256)
    assert sorted(r.hv for r in direct.collect()) == sorted(
        r.hv for r in rows
    )
