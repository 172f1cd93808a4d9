"""Salted-join / salted-aggregation equivalence with the plain plans."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.skew import (
    salted_count_by_key,
    salted_join,
    with_salt,
)


def _skewed_frames(spark):
    # key 1 is hot (80 rows), others sparse
    left = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(80)]
        + [Row(k=2, v=100), Row(k=3, v=200), Row(k=9, v=300)]
    )
    right = spark.createDataFrame(
        [Row(k=1, name="hot"), Row(k=2, name="two"), Row(k=4, name="unmatched")]
    )
    return left, right


def test_salted_inner_join_equals_plain(spark):
    left, right = _skewed_frames(spark)
    plain = sorted((r.k, r.v, r.name) for r in left.join(right, "k").collect())
    salted = sorted(
        (r.k, r.v, r.name) for r in salted_join(left, right, ["k"], n_salts=4).collect()
    )
    assert salted == plain


def test_salted_left_join_equals_plain(spark):
    left, right = _skewed_frames(spark)
    plain = sorted(
        (r.k, r.v, r.name) for r in left.join(right, "k", "left").collect()
    )
    salted = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(left, right, ["k"], n_salts=4, how="left").collect()
    )
    assert salted == plain


def test_salt_is_deterministic_and_spreads(spark):
    left, _ = _skewed_frames(spark)
    s1 = with_salt(left, 4).collect()
    s2 = with_salt(left, 4).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    hot_salts = {r._salt for r in s1 if r.k == 1}
    assert len(hot_salts) > 1  # the hot key actually spreads


def test_salted_count_matches_plain(spark):
    left, _ = _skewed_frames(spark)
    plain = {(r.k): r.n for r in left.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {(r.k): r.n for r in salted_count_by_key(left, ["k"], n_salts=4).collect()}
    assert salted == plain


def test_simhash_banding_finds_all_close_pairs(spark, sf_dir):
    """Pigeonhole exactness: banding must find EVERY pair within the
    hamming bound (compared against the brute-force pair set)."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        simhash_near_duplicate_pairs,
        simhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    ids = sorted(sig)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sig[a] ^ sig[b]).count("1") <= 3
    }
    got = {
        (r.a_id, r.b_id)
        for r in simhash_near_duplicate_pairs(docs, max_hamming=3).collect()
    }
    assert got == brute
    assert brute  # fixture contains close pairs


def test_key_skew_report_finds_planted_hot_key(spark):
    from pyspark.sql import functions as F

    from cdc_data_lake_pyspark_spark.operators.skew import key_skew_report

    df = spark.createDataFrame(
        [(99, i) for i in range(80)] + [(k, 0) for k in range(20)],
        "k long, x long",
    )
    got = key_skew_report(df, ["k"], top_n=3).collect()
    assert got[0]["k"] == 99 and got[0]["rank"] == 1
    assert got[0]["n"] == 80 and abs(got[0]["share"] - 0.8) < 1e-12
    # ties on n=1 break on key ascending
    assert [r["k"] for r in got[1:]] == [0, 1]
