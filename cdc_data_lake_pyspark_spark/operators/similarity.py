"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

BASELINE.json §2.6 capability additions.  The embedding column is
``array<float>``; all math is done after casting elements to double, with
strict left-to-right folds (``F.aggregate``) so scores are bit-identical to
a sequential-loop oracle.

Scale design:

* ``brute_force_top_k`` — the exact baseline: block-nested-loop join with
  the query side broadcast.  O(N·Q·d) but fully JVM/codegen; correct tool
  when Q (the query set) is small.
* ``hyperplane_lsh_top_k`` — the scale path: random-hyperplane signatures
  (Charikar) bucket vectors so only same-bucket pairs are scored.  The
  hyperplanes are generated driver-side from a fixed seed (deterministic)
  and shipped as literals — a few KB, no shuffle.  Probing multiple bucket
  permutations trades compute for recall.
"""

from __future__ import annotations

import random
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Strict left-to-right fold — deterministic, oracle-reproducible."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    a = _as_double(a)
    b = _as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_top_k(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact top-k neighbors for each query vector:
    ``(query_id, neighbor_id, score, rank)``.

    The query side is broadcast; each corpus partition scores its vectors
    against every query without any shuffle of the corpus.  Ties break on
    neighbor id (ascending) for determinism.  ``exclude_self`` drops
    pairs where the ids coincide BEFORE ranking (self-join usage).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vv"))
    scored = v.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_qv"), F.col("_vv")).alias("score"),
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def hyperplane_signature(
    vec: Column, hyperplanes: Sequence[Sequence[float]]
) -> Column:
    """Bit-pack sign(v·h_i) into a long — the LSH bucket id."""
    sig = F.lit(0).cast("long")
    for i, h in enumerate(hyperplanes):
        hcol = F.array(*[F.lit(float(x)) for x in h])
        bit = F.when(dot(_as_double(vec), hcol) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def make_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_lsh_top_k(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 1,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only same-bucket (vector, query) pairs,
    over ``n_tables`` independent hyperplane tables for recall.

    Returns ``(query_id, neighbor_id, score, rank)`` like the exact op —
    drop-in, with recall controlled by (n_planes, n_tables).
    """
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vv"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cands = None
    for t in range(n_tables):
        planes = make_hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        vb = v.withColumn("_bkt", hyperplane_signature(F.col("_vv"), planes))
        qb = q.withColumn("_bkt", hyperplane_signature(F.col("_qv"), planes))
        pairs = vb.join(F.broadcast(qb), "_bkt").select(
            "query_id", "neighbor_id", "_qv", "_vv"
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    scored = (
        cands.dropDuplicates(["query_id", "neighbor_id"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_vv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
