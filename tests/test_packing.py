"""Sequence packing (operators/packing.py)."""

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.packing import pack_documents


def _docs(spark, toks, start_id=1):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(toks)],
        "doc_id long, n_tokens long",
    )


def test_greedy_first_fit_single_group(spark):
    # one group so the walk is fully predictable
    docs = _docs(spark, [100, 200, 250, 300, 512, 1])
    out = pack_documents(docs, budget=512, n_groups=1)
    got = {r["doc_id"]: r["bin"] for r in out.collect()}
    # 100+200 -> bin1 (300); +250 would be 550 > 512 -> bin2; +300=550>512? 250+300=550 -> bin3;
    # 512 alone -> bin4 (300+512>512); 1 -> 512+1>512 -> bin5
    assert got == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5}


def test_bins_respect_budget_except_oversize_docs(spark):
    docs = _docs(spark, [700, 10, 20, 600, 30])
    out = pack_documents(docs, budget=64, n_groups=1)
    fills = (
        out.groupBy("group", "bin")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    for r in fills:
        assert r["fill"] <= 64 or r["n"] == 1  # oversize docs sit alone


def test_bins_are_contiguous_per_group(spark):
    docs = _docs(spark, list(range(10, 90)) )
    out = pack_documents(docs, budget=128, n_groups=4)
    for grp, rows in [
        (g["group"], g["bins"])
        for g in out.groupBy("group")
        .agg(F.sort_array(F.collect_set("bin")).alias("bins"))
        .collect()
    ]:
        assert rows == list(range(1, len(rows) + 1)), (grp, rows)


def test_layout_independent(spark):
    docs = _docs(spark, [17 * (i % 13) + 5 for i in range(200)])
    a = {(r["group"], r["doc_id"]): r["bin"]
         for r in pack_documents(docs, budget=256, n_groups=8).collect()}
    b = {(r["group"], r["doc_id"]): r["bin"]
         for r in pack_documents(
             docs.repartition(13, "n_tokens"), budget=256, n_groups=8
         ).collect()}
    assert a == b
