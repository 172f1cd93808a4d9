"""ML feature preparation: categorical encoding, the hashing trick, and
per-component standardization.

The last mile between a cleaned corpus and a trainer is tabular feature
prep.  Three canonical transforms, each expressed so the result is
deterministic across engines, runs, and partitionings (the property
sklearn-style fit objects lose the moment data moves):

* frequency-ordered label encoding — category -> dense integer index,
  most frequent first with a lexicographic tiebreak (StringIndexer's
  ``frequencyDesc`` contract, made deterministic);
* feature hashing (Weinberger et al. 2009) — token -> bounded bucket id
  via the portable md5 hash, so the feature space is fixed-width without
  a vocabulary broadcast and ANY engine reproduces the same buckets;
* per-component standardization — z-scores from exact integer
  micro-unit moments (quantize-then-sum, the embedding_centroids
  bridge), so the fitted stats are order-independent and the only float
  ops are one subtraction/division per value from identical exact
  integers.

Scale notes per function.  No UDFs anywhere — every transform is
builtin-expression JVM code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.relational import portable_id_hash

#: micro-unit quantization shared with embedding_centroids: floats become
#: exact 1e-6 integers BEFORE any aggregation.
MICRO = 10**6


def label_encode(
    df: DataFrame, value_col: str, out_col: str | None = None
) -> DataFrame:
    """Dense integer index per category, ordered by (frequency desc,
    value asc) — index 0 is the most frequent category, ties break
    lexicographically so the mapping is a pure function of the data.

    Scale: one map-side-combined count aggregate over the column, then
    the vocabulary (bounded by category cardinality, tiny next to the
    fact) gets its indexes from an unpartitioned ranking window — fine
    because it runs on vocab rows only — and broadcast-joins back.  The
    fact table itself never reshuffles."""
    out_col = out_col or f"{value_col}_idx"
    vocab = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy(F.col("_n").desc(), F.col(value_col).asc())
    idx = vocab.select(
        value_col, (F.row_number().over(w) - 1).cast("int").alias(out_col)
    )
    return df.join(F.broadcast(idx), value_col)


def feature_hash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """The hashing trick: whitespace tokens hashed into ``n_buckets``
    fixed buckets, counted per (row, bucket) — a bounded-width sparse
    feature vector with NO vocabulary pass, no fit state, and no OOV
    handling (unseen tokens land in some bucket by construction).

    The bucket function is the portable 60-bit md5 hash mod
    ``n_buckets`` — reproducible in any engine (the split/sample
    contract), unlike ``hashingTF``'s JVM-internal murmur.  Scale: one
    explode + one (id, bucket)-keyed aggregate with map-side combine;
    output rows are bounded by rows × min(tokens, buckets)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_tok"),
    )
    bucketed = toks.select(
        id_col,
        F.pmod(portable_id_hash(F.col("_tok")), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )
    return (
        bucketed.groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def standardize_components(
    df: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Per-component z-scores for an ``array<float>`` column, fitted on
    the data itself: each (row, dim) value standardized against that
    dimension's population mean/std.

    Determinism: values quantize to exact 1e-6 integers FIRST, so the
    fitted moments (n, sum, sum-of-squares) are order-independent
    BIGINTs; the z-score is then ``(v*n - sum) / sqrt(n*ssq - sum²)``
    evaluated in double from those identical integers — the micro scale
    cancels, and both factors of the sqrt argument are computed in
    double (n·ssq can exceed int64) with the same expression text in
    every engine, so results are bit-identical.

    Scale: posexplode keeps everything JVM-side; the moment fit is one
    (dim)-keyed aggregate (dims-many groups — map-side combine does
    nearly all the work) and the per-dim stats frame (dims rows)
    broadcast-joins back.  Zero-variance dims yield NULL z-scores
    rather than a division blow-up."""
    ex = df.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("dim", "_v"),
    ).select(
        id_col,
        "dim",
        F.round(F.col("_v").cast("double") * MICRO).cast("long").alias("vq"),
    )
    stats = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vq").alias("sum_q"),
        F.sum(F.col("vq") * F.col("vq")).alias("ssq_q"),
    )
    joined = ex.join(F.broadcast(stats), "dim")
    denom = F.sqrt(
        F.col("n").cast("double") * F.col("ssq_q").cast("double")
        - F.col("sum_q").cast("double") * F.col("sum_q").cast("double")
    )
    num = (F.col("vq") * F.col("n") - F.col("sum_q")).cast("double")
    return joined.select(
        id_col,
        "dim",
        "vq",
        "n",
        "sum_q",
        "ssq_q",
        F.when(denom > 0, num / denom).alias("z"),
    )


def label_encode_multi(
    df: DataFrame, value_cols: list[str]
) -> DataFrame:
    """Frequency-ordered label encoding for SEVERAL columns in ONE fact
    scan: the per-column vocabularies come from a single
    explode-to-(column, value) aggregate instead of one counting pass
    per column (``label_encode`` N times scans the fact N+1 times; this
    scans it twice — once for all vocabularies, once joining the
    indexes back).

    Same contract per column as :func:`label_encode`: index 0 is the
    most frequent value, ties break lexicographically.  The ranking
    window partitions by column name over vocab-sized rows; each
    column's index frame broadcasts back."""
    pairs = F.explode(
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in value_cols]),
            F.array(*[F.col(c).cast("string") for c in value_cols]),
        )
    ).alias("_col", "_val")
    vocab = (
        df.select(pairs)
        .groupBy("_col", "_val")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w = Window.partitionBy("_col").orderBy(
        F.col("_n").desc(), F.col("_val").asc()
    )
    idx = vocab.select(
        "_col", "_val", (F.row_number().over(w) - 1).cast("int").alias("_idx")
    ).localCheckpoint(eager=True)
    out = df
    for c in value_cols:
        side = F.broadcast(
            idx.filter(F.col("_col") == c).select(
                F.col("_val").alias(c), F.col("_idx").alias(f"{c}_idx")
            )
        )
        out = out.join(side, c)
    return out
