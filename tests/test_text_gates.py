"""PII scrubbing, contamination detection, repetition gate."""

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.functions.text import pii_counts, scrub_pii
from cdc_data_lake_pyspark_spark.operators.dedup_text import contamination_report


def test_scrub_pii_redacts_all_occurrences(spark):
    rows = [
        (1, "mail a@b.com and c.d+x@e.org, call 555-123-4567 or 555.987.6543"),
        (2, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: (r["red"], r["ne"], r["np"])
        for r in df.select(
            "id",
            scrub_pii(F.col("text")).alias("red"),
            pii_counts(F.col("text"))["n_emails"].alias("ne"),
            pii_counts(F.col("text"))["n_phones"].alias("np"),
        ).collect()
    }
    red, ne, np_ = out[1]
    assert "<EMAIL>" in red and "@" not in red
    assert "<PHONE>" in red and "555" not in red
    assert (ne, np_) == (2, 2)
    assert out[2] == ("no pii here at all", 0, 0)


def test_contamination_report_finds_planted_overlap(spark):
    eight = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"leading words then {eight} trailing stuff here"),
            (2, "completely unrelated text with no overlap whatsoever okay"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"the benchmark contains {eight} exactly once")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["bench_id"]): r["n_shared"]
        for r in contamination_report(docs, bench, k=8).collect()
    }
    assert (1, 100) in got and got[(1, 100)] >= 1
    assert all(d != 2 for d, _ in got)


def test_contamination_min_hits_threshold(spark):
    eight = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(1, f"{eight} and a little more")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, f"{eight} something else entirely")], "doc_id long, text string"
    )
    loose = contamination_report(docs, bench, k=8, min_hits=1).count()
    strict = contamination_report(docs, bench, k=8, min_hits=50).count()
    assert loose >= 1 and strict == 0


def test_substring_window_dedup_semantics(spark):
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        substring_window_dedup,
    )

    phrase = "a b c d"  # k=4 windows
    docs = spark.createDataFrame(
        [
            (1, f"{phrase} x y z"),        # keeper of the shared span
            (2, f"p q {phrase} r"),        # loses the span, keeps p q r
            (3, "p q r"),                  # shorter than k: untouched
            (4, phrase),                   # duplicate span only -> emptied
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in substring_window_dedup(docs, k=4).collect()}
    assert out[1].clean_text == "a b c d x y z" and out[1].n_dropped == 0
    assert out[2].clean_text == "p q r" and out[2].n_dropped == 4
    assert out[3].clean_text == "p q r" and out[3].n_dropped == 0
    assert out[4].clean_text == "" and out[4].n_dropped == 4
    assert out[2].n_tokens == 7


def test_normalize_text_collapses_formatting_variants(spark):
    """normalize_text (RefinedWeb fuzzy-exact normalization): case,
    punctuation and whitespace variants of the same content collapse to
    one fingerprint group; genuinely different content does not."""
    from pyspark.sql import functions as F

    from cdc_data_lake_pyspark_spark.functions.text import normalize_text
    from cdc_data_lake_pyspark_spark.operators.dedup_text import exact_dedup

    docs = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO—world…"),
            (4, "hello worlds"),
            (5, ""),
            (6, "  ,,, "),
        ],
        "doc_id long, text string",
    )
    norm = docs.select("doc_id", normalize_text(F.col("text")).alias("text"))
    got = {
        r["keeper_id"]: r["n_docs"]
        for r in exact_dedup(norm, normalize=False).collect()
    }
    assert got[1] == 3  # docs 1-3 collapse
    assert got[4] == 1
    assert got[5] == 2  # empty and punctuation-only both normalize to ""
