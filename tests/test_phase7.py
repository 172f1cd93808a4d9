"""Phase-7 operator tests: blocked record linkage, median/MAD robust
outliers, fixed-point PageRank, and hopping-window aggregation."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.graph import (
    RANK_SCALE,
    pagerank,
)
from cdc_data_lake_pyspark_spark.operators.linkage import blocked_edit_pairs
from cdc_data_lake_pyspark_spark.operators.quality import mad_outliers
from cdc_data_lake_pyspark_spark.operators.relational import (
    hopping_window_agg,
)


# ---------------------------------------------------------------- linkage
def _people(spark):
    return spark.createDataFrame(
        [
            Row(pid=1, name="jon smith", region=1, seg="A"),
            Row(pid=2, name="jon smyth", region=1, seg="B"),  # 1 edit from 1
            Row(pid=3, name="jon smith", region=2, seg="A"),  # other block
            Row(pid=4, name="jane doe!", region=1, seg="A"),
            Row(pid=5, name="jane doe?", region=1, seg="A"),  # 1 edit from 4
            Row(pid=6, name="zzz other", region=1, seg="A"),
        ]
    )


def test_linkage_finds_planted_pairs_within_blocks(spark):
    out = blocked_edit_pairs(
        _people(spark),
        id_col="pid",
        text_col="name",
        block_cols=["region"],
        prefix_len=4,
        max_edit=2,
        carry_cols=["seg"],
    )
    rows = {(r.id_a, r.id_b): r for r in out.collect()}
    assert set(rows) == {(1, 2), (4, 5)}
    assert rows[(1, 2)].edit_dist == 1
    assert rows[(1, 2)].seg_a == "A" and rows[(1, 2)].seg_b == "B"
    # normalized similarity is the exact rational 1 - d/len
    assert math.isclose(rows[(1, 2)].name_sim, 1 - 1 / 9)


def test_linkage_blocking_excludes_cross_block_duplicates(spark):
    # pid 1 and 3 are IDENTICAL strings but in different regions: the
    # block key must keep them apart (that's the whole point of blocking)
    out = blocked_edit_pairs(
        _people(spark),
        id_col="pid",
        text_col="name",
        block_cols=["region"],
        max_edit=0,
    )
    assert [(r.id_a, r.id_b) for r in out.collect()] == []


# ------------------------------------------------------------ MAD outliers
def test_mad_outliers_flags_planted_anomaly(spark):
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    df = spark.createDataFrame(
        [Row(i=i, g="a", v=v) for i, v in enumerate(vals)]
    )
    out = mad_outliers(
        df, value_col="v", group_cols=["g"], threshold=3.5, id_cols=["i"]
    ).collect()
    assert [r.i for r in out] == [5]
    r = out[0]
    # discrete lower-median of 6 values = rank ceil(3) = 12.0;
    # deviations sorted: 0,1,1,2,2,988 -> median rank 3 = 1.0
    assert r.group_median == 12.0
    assert r.group_mad == 1.0
    assert math.isclose(r.robust_z, 0.6745 * (1000.0 - 12.0) / 1.0)


def test_mad_outliers_skips_zero_mad_groups(spark):
    df = spark.createDataFrame(
        [Row(i=i, g="c", v=5.0) for i in range(9)]
        + [Row(i=99, g="c", v=500.0)]
    )
    # median 5, deviations mostly 0 -> MAD 0: group must be excluded
    assert (
        mad_outliers(df, value_col="v", group_cols=["g"]).count() == 0
    )


# ---------------------------------------------------------------- pagerank
def test_pagerank_star_graph_ranks_hub_highest(spark):
    # star: 1..5 all point at 0, and 0 points back at each (so no
    # dangling mass anywhere)
    edges = spark.createDataFrame(
        [Row(src=i, dst=0) for i in range(1, 6)]
        + [Row(src=0, dst=i) for i in range(1, 6)]
    )
    out = {r.node: r for r in pagerank(edges, iterations=6).collect()}
    hub, leaf = out[0], out[1]
    assert hub.rank_micro > leaf.rank_micro
    # all leaves identical by symmetry (exact integer equality)
    assert len({out[i].rank_micro for i in range(1, 6)}) == 1
    # mass conservation up to floor-division loss: total <= 1.0 and
    # within #nodes * iterations ulps of it
    total = sum(r.rank_micro for r in out.values())
    assert total <= RANK_SCALE
    assert total >= RANK_SCALE - 6 * 12 * 10
    assert math.isclose(hub.rank, hub.rank_micro / RANK_SCALE)


def test_pagerank_two_node_cycle_is_uniform(spark):
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=1)]
    )
    out = {r.node: r.rank_micro for r in pagerank(edges, iterations=4).collect()}
    # a 2-cycle's stationary distribution is uniform; integer schedule
    # preserves the symmetry exactly
    assert out[1] == out[2]


# ---------------------------------------------------------- hopping window
def test_hopping_window_replicates_each_event_to_covering_hops(spark):
    df = spark.createDataFrame(
        [Row(k="a", ts="2024-01-01 05:30:00", v=2.5)]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = hopping_window_agg(
        df,
        ts_col="ts",
        window="3 hours",
        slide="1 hour",
        group_cols=["k"],
        value_col="v",
    ).collect()
    starts = sorted(str(r.hop_start) for r in out)
    assert starts == [
        "2024-01-01 03:00:00",
        "2024-01-01 04:00:00",
        "2024-01-01 05:00:00",
    ]
    assert all(r.n_rows == 1 and r.total == 2.5 for r in out)
    assert all(
        (r.hop_end - r.hop_start).total_seconds() == 3 * 3600 for r in out
    )


def test_hopping_window_counts_overlap(spark):
    # two events one hour apart share exactly two 3h/1h windows
    df = spark.createDataFrame(
        [
            Row(k="a", ts="2024-01-01 05:30:00", v=1.0),
            Row(k="a", ts="2024-01-01 06:30:00", v=1.0),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = hopping_window_agg(
        df, ts_col="ts", window="3 hours", slide="1 hour", group_cols=["k"]
    )
    by_start = {str(r.hop_start): r.n_rows for r in out.collect()}
    assert by_start == {
        "2024-01-01 03:00:00": 1,
        "2024-01-01 04:00:00": 2,
        "2024-01-01 05:00:00": 2,
        "2024-01-01 06:00:00": 1,
    }


# ------------------------------------------------------------ sparse cosine
def test_sparse_cosine_finds_planted_near_dup(spark):
    from cdc_data_lake_pyspark_spark.operators.sparse_sim import (
        sparse_cosine_pairs,
        tfidf_weights,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta"),
            Row(doc_id=2, text="alpha beta gamma epsilon"),  # near-dup of 1
            Row(doc_id=3, text="zeta eta theta iota"),
            Row(doc_id=4, text="common common common common"),
        ]
    )
    out = {
        (r.doc_a, r.doc_b): r
        for r in sparse_cosine_pairs(docs, threshold=0.4).collect()
    }
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    # shared tokens alpha/beta/gamma have df=2 -> idf_milli=1000; the
    # unique tail token df=1 -> 2000.  dot = 3·10⁶, each norm² = 7·10⁶
    # -> cosine exactly 3/7
    assert math.isclose(r.cosine, 3 / 7)
    assert r.dot == 3_000_000

    # ubiquitous tokens (df == N -> idf 0) are pruned from the weights
    docs2 = spark.createDataFrame(
        [Row(doc_id=i, text="common rare%d" % i) for i in range(4)]
    )
    w = tfidf_weights(docs2)
    assert w.filter(F.col("token") == "common").count() == 0
    assert w.count() == 4


def test_sparse_cosine_identical_docs_cosine_one(spark):
    from cdc_data_lake_pyspark_spark.operators.sparse_sim import (
        sparse_cosine_pairs,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="x y z unique1"),
            Row(doc_id=2, text="x y z unique1"),
            Row(doc_id=3, text="completely different words here"),
        ]
    )
    rows = sparse_cosine_pairs(docs, threshold=0.99).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(1, 2)]
    assert rows[0].cosine == 1.0
