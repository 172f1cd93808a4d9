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

import math
import os
import random
import shutil
from typing import Optional, Sequence

import numpy as np
import pandas as pd
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


def cosine_pandas_udf():
    """Arrow-batched cosine over two ``array<float>`` columns, bit-identical
    to :func:`cosine`: ``np.cumsum`` is a strict sequential running sum, so
    every intermediate rounding matches the ``F.aggregate`` fold (numpy's
    ``.sum`` uses pairwise summation, which rounds differently).  ~100×
    the throughput of the interpreted fold expression."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _cosine(qcol: pd.Series, vcol: pd.Series) -> pd.Series:
        Q = np.vstack(qcol.to_numpy()).astype(np.float64)
        V = np.vstack(vcol.to_numpy()).astype(np.float64)
        seq_sum = lambda M: np.cumsum(M, axis=1)[:, -1]
        num = seq_sum(Q * V)
        den = np.sqrt(seq_sum(Q * Q)) * np.sqrt(seq_sum(V * V))
        return pd.Series(num / den)

    return _cosine


def _min_parallel(df: DataFrame) -> DataFrame:
    """Raise a scan's partition count to the cluster's default parallelism
    when the source has fewer splits (a compactly-written corpus can be
    ONE parquet file, serializing every per-partition scorer onto one
    core).  No-op — no added shuffle — whenever the input already has
    enough splits, which is the normal state at scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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

    The (small, by contract) query set is collected into the task closure
    as a dense matrix; each corpus partition is scored against ALL queries
    in one Arrow-batched ``mapInPandas`` pass.  The corpus crosses the
    Arrow boundary ONCE — O(N) transfer — instead of materializing the
    N×Q pair frame a crossJoin would ship (O(N·Q) vectors).  Scores use
    ``np.cumsum`` (strict sequential running sum), bit-identical to the
    ``F.aggregate`` fold in :func:`cosine` / a sequential-loop oracle.
    Ties break on neighbor id (ascending) for determinism.
    ``exclude_self`` drops pairs where the ids coincide BEFORE ranking
    (self-join usage).
    """
    q_pdf = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).toPandas()
    qids = q_pdf["query_id"].to_numpy()
    Q = np.vstack(q_pdf["_qv"].to_numpy()).astype(np.float64)
    seq_sum = lambda M: np.cumsum(M, axis=1)[:, -1]
    q_norms = np.sqrt(seq_sum(Q * Q))

    id_type = vectors.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    out_schema = f"query_id {qid_type}, neighbor_id {id_type}, score double"

    def _score(batches):
        for pdf in batches:
            V = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            v_norms = np.sqrt(seq_sum(V * V))
            scores = np.empty((len(V), len(Q)))
            for j in range(len(Q)):
                scores[:, j] = seq_sum(V * Q[j]) / (q_norms[j] * v_norms)
            yield pd.DataFrame(
                {
                    "query_id": np.tile(qids, len(V)),
                    "neighbor_id": np.repeat(pdf[id_col].to_numpy(), len(Q)),
                    "score": scores.ravel(),
                }
            )

    scored = _min_parallel(vectors.select(id_col, vec_col)).mapInPandas(
        _score, out_schema
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


def suggest_lsh_planes(n_vectors: int, target_bucket_rows: int = 64) -> int:
    """Plane count so expected bucket occupancy stays ~``target_bucket_rows``.

    Candidate generation does quadratic work WITHIN a bucket, so fixed
    ``n_planes`` means occupancy — and shuffle — grows linearly-squared
    with the corpus (measured: 10x corpus → ~95x candidate shuffle at 6
    planes, tools/measure_scale.py).  Growing ``n_planes`` with
    ``log2(N / target)`` pins occupancy; per-table recall drops as planes
    grow, so scale ``n_tables`` alongside (P[collide in >=1 table] =
    1 − (1 − (1 − θ/π)^planes)^tables).
    """
    import math

    return max(4, math.ceil(math.log2(max(n_vectors / target_bucket_rows, 2.0))))


def auto_lsh_params(
    n_vectors: int,
    min_cosine: float = 0.4,
    target_bucket_rows: int = 64,
    target_recall: float = 0.5,
) -> tuple[int, int]:
    """Auto-size ``(n_planes, n_tables)`` from the corpus count.

    Planes come from the measured occupancy law (:func:`suggest_lsh_planes`:
    occupancy — and therefore within-bucket quadratic candidate work —
    stays ~``target_bucket_rows`` as the corpus grows).  Tables then
    restore recall: a pair at exactly ``min_cosine`` collides per plane
    with p = 1 − θ/π, per table with p^planes, and across T tables with
    1 − (1 − p^planes)^T ≥ ``target_recall`` →
    T = ⌈log(1 − recall) / log(1 − p^planes)⌉.  ``target_recall`` is the
    floor AT the threshold angle — the hardest pair; true near-duplicates
    sit well above ``min_cosine`` and collide with much higher
    probability (the pinned-recall tests in test_phase2.py measure ≥0.9
    end-to-end).  Everything is a pure function of (count, parameters),
    so the DuckDB oracle replays the same sizing from the same corpus.
    """
    import math

    n_planes = suggest_lsh_planes(n_vectors, target_bucket_rows)
    p = 1.0 - math.acos(min(max(min_cosine, -1.0), 1.0)) / math.pi
    per_table = p**n_planes
    n_tables = max(4, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - per_table)))
    return n_planes, n_tables


def _sq_dists(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Squared Euclidean distance matrix via the expanded form — O(N·k·d)
    flops through one BLAS matmul, never materializing (N, k, d)."""
    return (
        (X * X).sum(axis=1)[:, None]
        - 2.0 * (X @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )


def _lut_block(QR_j: np.ndarray, book: np.ndarray) -> np.ndarray:
    """Micro-quantized residual sq-dist LUT rows: ``round(1e6 *
    ||QR_j[i] − book[c]||²)`` as int64, computed with a SHAPE-INVARIANT
    expression — ``((row − book)²).sum(last axis)`` — never a GEMM.

    The IVF-PQ oracle contract needs the driver-built oracle LUT (all
    queries at once) and the executor-built micro-LUT (each Arrow batch's
    distinct (query, cell) pairs) to agree bit-for-bit.  ``_sq_dists``'s
    expanded-form BLAS matmul does NOT guarantee that: GEMM blocking and
    threading may change summation order with the row count, so the same
    logical row can round differently in differently-shaped calls
    (ADVICE r7).  Here the reduction runs along the fixed-length
    subspace axis only — numpy's pairwise summation over axis=-1 depends
    on ds alone, so every row's bits are independent of how many rows
    share the call.  Rows are processed in fixed 1024-row tiles to bound
    the (rows, n_codes, ds) broadcast temporary."""
    out = np.empty((len(QR_j), len(book)), dtype=np.int64)
    for lo in range(0, len(QR_j), 1024):
        d = QR_j[lo : lo + 1024, None, :] - book[None, :, :]
        out[lo : lo + 1024] = np.rint(1e6 * (d * d).sum(axis=2)).astype(
            np.int64
        )
    return out


def fit_kmeans(X: np.ndarray, k: int, seed: int = 42, n_iter: int = 20) -> np.ndarray:
    """Deterministic Lloyd's k-means: seeded distinct-row init, fixed
    iteration count, first-index argmin ties.  Given the same rows in the
    same order the centroids are bit-identical on any host — which is what
    lets the DuckDB oracle replay the quantizer as literals.  (The SAME
    function produces both the operator's structures and the oracle's
    literals, so its internal numerics may evolve without breaking
    engine parity.)

    The update step is fully vectorized — ``np.add.at`` scatter-sum +
    ``bincount`` — O(N·d) per iteration independent of k, and the
    assignment distance matrix is computed in bounded row chunks, so
    auto-sized cell counts (k ~ 4·sqrt(N)) stay cheap at the 200k-row
    fit bound instead of the O(k·N) per-iteration python loop the naive
    form costs.

    Assignment scores in FLOAT32 via one contiguous-operand sgemm per
    chunk, ranking ``x·c − ||c||²/2`` (argmax ≡ squared-distance argmin,
    first-index ties preserved): the f64 expanded form was
    output-bandwidth-bound at ~11 GFLOPS on the tall-skinny (N, 64) ×
    (64, k) shape — and numpy's ``X @ C.T`` with a TRANSPOSED-VIEW
    operand falls off the fast sgemm path entirely (measured 14x: 4.5 s
    vs 0.31 s for the same multiply with ``ascontiguousarray(C.T)``).
    f32 scoring can flip a near-tie assignment vs f64 (measured 1 in
    200k rows); the update step stays float64, and the oracle-parity
    margin tests (tests/test_pq.py) pin that final-centroid assignment
    margins sit far above both round-offs."""
    rng = np.random.RandomState(seed)
    C = X[np.sort(rng.choice(len(X), size=min(k, len(X)), replace=False))].copy()
    if len(C) < k:  # degenerate corpus: pad by repeating rows
        C = np.vstack([C, X[: k - len(C)]])
    # augment with a constant-1 coordinate so the −||c||²/2 bias rides
    # inside the sgemm (a broadcast subtract over the (rows, k) score
    # block costs ~2x the gemm itself — it re-reads and re-writes the
    # whole block)
    X32 = np.ascontiguousarray(
        np.concatenate([X, np.ones((len(X), 1))], axis=1), dtype=np.float32
    )
    # chunk so the (rows × k) f32 score block stays ~256 MB
    chunk = max(1, min(len(X), int(64_000_000 / max(1, k))))
    assign = np.empty(len(X), dtype=np.int64)
    for _ in range(n_iter):
        C32 = np.asarray(C, dtype=np.float32)
        C32t = np.ascontiguousarray(
            np.concatenate(
                [C32, -0.5 * (C32 * C32).sum(axis=1)[:, None]], axis=1
            ).T
        )
        for lo in range(0, len(X), chunk):
            hi = lo + chunk
            assign[lo:hi] = (X32[lo:hi] @ C32t).argmax(axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, assign, X)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
    return C


def auto_ivf_params(n: int) -> tuple[int, int]:
    """Derive ``(n_clusters, n_probe)`` from the corpus count — the IVF
    analogue of :func:`auto_lsh_params`.  FAISS guidance puts nlist
    between 4·sqrt(N) and 16·sqrt(N); we take the low end (cheapest fit)
    clamped so cells keep >= 32 members (tiny corpora degenerate to the
    16-cell default) and to 4096 total (the fit bound's budget).
    ``n_probe`` is ``4·sqrt(nlist)`` (floor 4, capped at nlist):
    candidate work per query is ``n_probe · N / n_clusters`` ~
    ``4·sqrt(nlist)·N/nlist`` ~ ``2·N^(3/4)`` — still SUBLINEAR in the
    corpus — where a frozen 16-cell layout keeps per-query work at a
    constant 1/4 of the corpus forever (the r6 100x measurement caught
    exactly that: 200M candidate rows at 200k vectors × 4k queries).
    The 4x multiplier over plain sqrt(nlist) comes from the r7 100x
    probe/code sweep (SCALE.md §10): with the auto shortlist, probe
    coverage — NOT ADC code resolution — is the recall ceiling on a
    decorrelated corpus (probes 42→168 moved recall@3 0.53→0.71 at ~5%
    wall; 16x finer codebooks moved it +0.01), and the 4x probe budget
    is still a ~9% corpus read at the auto nlist.  Recall at the probed
    fraction is floor-pinned in tests/test_pq.py; the exact re-rank
    shortlist absorbs the ADC ranking noise."""
    import math

    n_clusters = max(16, min(4096, 4 * int(math.isqrt(max(1, n))), n // 32))
    n_probe = min(n_clusters, max(4, 4 * int(math.isqrt(n_clusters))))
    return n_clusters, n_probe


def auto_pq_codes(n: int) -> int:
    """Per-sub-quantizer code count for the corpus size.  Small corpora
    keep the 16-code (4-bit) books — cheap to fit, and at a few thousand
    vectors the exact re-rank shortlist already covers most of each
    probed cell.  At scale the r7 100x sweep (SCALE.md §10) showed the
    recall ceiling is the 4-bit ADC noise floor, NOT probe coverage, so
    once the bounded fit sample is deep enough to train them (FAISS
    guidance: >= ~39 points per centroid, i.e. ~10k rows for 256 codes)
    we move to the canonical FAISS 8-bit books: 16x lower quantization
    noise per subspace at identical ADC query cost (the per-vector ADC
    sum is m_sub LUT gathers regardless of the code count)."""
    return 256 if n >= 50_000 else 16


def fit_ivf_centroids(
    vectors: DataFrame,
    n_clusters: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_fit_rows: int = 200_000,
) -> np.ndarray:
    """Fit the IVF coarse quantizer on a bounded, id-ordered sample.

    The driver-side fit is standard IVF practice (FAISS trains the
    quantizer on a bounded sample too — centroid quality saturates long
    before 200k rows); ``orderBy(id).limit(n)`` is a TakeOrdered (per
    -partition heap + driver merge, no global sort) and makes the training
    set — hence the centroids — a pure deterministic function of the data,
    replayable by the SQL oracle generator.
    """
    pdf = (
        vectors.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(max_fit_rows)
        .toPandas()
    )
    X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    return fit_kmeans(X, n_clusters, seed=seed)


def ivf_top_k(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 1,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
    max_fit_rows: int = 200_000,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer + multi-probe.

    Corpus vectors are assigned to their nearest of ``n_clusters``
    centroids (deterministic Lloyd's fit on a bounded id-ordered sample,
    :func:`fit_ivf_centroids`); each query probes its ``n_probe`` closest
    centroids and scores only vectors in those cells.  Returns
    ``(query_id, neighbor_id, score, rank)`` — drop-in with the exact op;
    recall is controlled by ``n_probe / n_clusters``.  ``exclude_self``
    drops identical-id pairs before ranking, matching
    :func:`brute_force_top_k` (off by default: query and corpus id spaces
    may legitimately collide).

    Scale: the centroid table is tiny (UDF closure); assignment is one
    Arrow-batched matmul over the corpus; the search joins on the cell id,
    so per-query work is ``n_probe/n_clusters`` of the corpus.  At 100 TB
    the cells are the partition key — the classic IVF layout where each
    cell's vectors are co-located.  The deterministic quantizer also makes
    the whole operator oracle-checkable: the same fit replayed offline
    pins the centroids as SQL literals.
    """
    from pyspark.sql.pandas.functions import pandas_udf

    centers = fit_ivf_centroids(
        vectors,
        n_clusters,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        max_fit_rows=max_fit_rows,
    )

    @pandas_udf("int")
    def _assign(col: pd.Series) -> pd.Series:
        V = np.vstack(col.to_numpy()).astype(np.float64)
        return pd.Series(_sq_dists(V, centers).argmin(axis=1).astype(np.int32))

    assigned = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vv"),
        _assign(F.col(vec_col)).alias("_cell"),
    )

    @pandas_udf("array<int>")
    def _probe(qcol: pd.Series) -> pd.Series:
        Q = np.vstack(qcol.to_numpy()).astype(np.float64)
        d = _sq_dists(Q, centers)
        idx = np.argsort(d, axis=1, kind="stable")[:, :n_probe].astype(np.int32)
        return pd.Series(list(idx))

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(_probe(F.col(vec_col))).alias("_cell"),
    )
    # IVF layout shuffle: repartition the assigned corpus on its cell key
    # so the probe join's candidate explosion parallelizes across the
    # cluster instead of inheriting the scan's split count (one corpus
    # pass; cells are near-uniform so no skew).
    assigned = assigned.repartition("_cell")
    scored = assigned.join(F.broadcast(q), "_cell")
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        cosine_pandas_udf()(F.col("_qv"), F.col("_vv")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _exact_rescored_pairs(A_ids, A, B_ids, B, threshold):
    """Score two id/matrix blocks: BLAS matmul prefilter at ``threshold −
    1e-6``, then a strict-sequential ``np.cumsum`` rescore of candidates
    only, keeping ``a_id < b_id`` — emitted scores are bit-identical to a
    sequential-loop (or ``F.aggregate`` fold) oracle while the matmul does
    99.9% of the work."""
    seq_sum = lambda X: np.cumsum(X, axis=1)[:, -1]
    a_norms = np.sqrt(seq_sum(A * A))
    b_norms = np.sqrt(seq_sum(B * B))
    # contiguous right operand: numpy's dgemm falls off the fast path on
    # a transposed VIEW (measured 3.8x at 25k-row blocks); the last-bit
    # change this makes to `approx` is absorbed by the 1e-6 prefilter
    # margin — emitted scores come from the exact sequential rescore.
    approx = (A @ np.ascontiguousarray(B.T)) / np.outer(a_norms, b_norms)
    cand_i, cand_j = np.nonzero(
        (approx >= threshold - 1e-6) & (A_ids[:, None] < B_ids[None, :])
    )
    if len(cand_i) == 0:
        return None
    exact = seq_sum(A[cand_i] * B[cand_j]) / (a_norms[cand_i] * b_norms[cand_j])
    keep = exact >= threshold
    return pd.DataFrame(
        {
            "a_id": A_ids[cand_i[keep]],
            "b_id": B_ids[cand_j[keep]],
            "score": exact[keep],
        }
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs:
    ``(a_id, b_id, score)`` with ``score >= threshold`` and ``a_id < b_id``.

    Distributed block-nested-loop self-join: the corpus is hashed into
    ``n_blocks`` blocks, each block is packed into ONE row (ids + matrix),
    and the ``n_blocks·(n_blocks+1)/2`` unordered block pairs are scored
    independently — each task runs one BLAS matmul over its two blocks,
    prefilters at ``threshold − 1e-6``, and exact-rescored candidates with
    the strict sequential ``np.cumsum`` fold (bit-identical to a
    sequential-loop oracle).  Only above-threshold pairs cross back over
    Arrow.

    Scale: no driver collect and no closure shipping — total shuffle is
    O(N · n_blocks) vector copies (each block meets every other block
    once), the classic exact all-pairs layout; pick ``n_blocks`` so a
    block's matrix fits executor memory (N/n_blocks rows).  Exact all-pairs
    is inherently O(N²) compute — for corpus-scale near-dup use
    :func:`cosine_near_dup_pairs_lsh`, which bounds the candidate space by
    hyperplane banding and exact-rescores only same-bucket pairs.
    """
    id_type = vectors.schema[id_col].dataType.simpleString()
    out_schema = f"a_id {id_type}, b_id {id_type}, score double"

    packed = (
        vectors.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
            F.struct(
                F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
            ).alias("_r"),
        )
        .groupBy("_blk")
        .agg(F.collect_list("_r").alias("_rows"))
    )
    a = packed.select(F.col("_blk").alias("_ba"), F.col("_rows").alias("_rows_a"))
    b = packed.select(F.col("_blk").alias("_bb"), F.col("_rows").alias("_rows_b"))
    block_pairs = a.join(b, F.col("_ba") <= F.col("_bb"))
    # spread the O(B²/2) block-pair tasks across the cluster
    block_pairs = block_pairs.repartition(
        vectors.sparkSession.sparkContext.defaultParallelism
    )

    def _unpack(rows):
        ids = np.asarray([r["id"] for r in rows])
        M = np.vstack([r["v"] for r in rows]).astype(np.float64)
        return ids, M

    def _score(batches):
        for pdf in batches:
            for rows_a, rows_b, same in zip(
                pdf["_rows_a"], pdf["_rows_b"], pdf["_ba"] == pdf["_bb"]
            ):
                A_ids, A = _unpack(rows_a)
                B_ids, B = (A_ids, A) if same else _unpack(rows_b)
                parts = [_exact_rescored_pairs(A_ids, A, B_ids, B, threshold)]
                if not same:
                    # unordered block pair: also score the b→a direction
                    parts.append(
                        _exact_rescored_pairs(B_ids, B, A_ids, A, threshold)
                    )
                parts = [p for p in parts if p is not None and len(p)]
                if parts:
                    yield pd.concat(parts, ignore_index=True)

    return block_pairs.mapInPandas(_score, out_schema)


def cosine_near_dup_pairs_lsh(
    vectors: DataFrame,
    threshold: float = 0.4,
    dim: int = 64,
    n_planes: int | None = None,
    n_tables: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_vectors: int | None = None,
) -> DataFrame:
    """Approximate embedding-cosine near-duplicate pairs — the 100 TB path.

    Hyperplane banding (same signatures as :func:`hyperplane_lsh_top_k`)
    buckets the corpus ``n_tables`` times; only same-``(table, bucket)``
    pairs are candidates, and every candidate is exact-rescored with the
    strict ``np.cumsum`` fold then filtered at ``threshold`` — so emitted
    pairs are a SUBSET of :func:`cosine_near_dup_pairs` with identical
    scores (precision 1; recall controlled by ``n_planes``/``n_tables``,
    P[collide in ≥1 table] = 1 − (1 − (1 − θ/π)^planes)^tables).

    Scale: the corpus never self-joins all-pairs — it shuffles once on
    ``(table, bucket)``; bucket sizes track near-duplicate clusters, not
    corpus size.  When ``n_planes``/``n_tables`` are omitted they are
    auto-sized from the corpus count via :func:`auto_lsh_params` (pass
    ``n_vectors`` to skip the counting job), so occupancy stays pinned as
    the corpus grows instead of exploding quadratically within buckets.
    Dedup across tables happens on the pair key before scoring so each
    candidate is scored once.
    """
    from pyspark.sql.pandas.functions import pandas_udf

    if n_planes is None or n_tables is None:
        if n_vectors is None:
            n_vectors = vectors.count()
        auto_planes, auto_tables = auto_lsh_params(n_vectors, min_cosine=threshold)
        n_planes = n_planes if n_planes is not None else auto_planes
        n_tables = n_tables if n_tables is not None else auto_tables

    planes = np.array(
        [make_hyperplanes(dim, n_planes, seed=seed + 1000 * t) for t in range(n_tables)]
    )
    H = planes.reshape(n_tables * n_planes, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def _buckets(col: pd.Series) -> pd.Series:
        V = np.vstack(col.to_numpy()).astype(np.float64)
        bits = (V @ H.T) >= 0
        b = (bits.reshape(len(V), n_tables, n_planes) * weights).sum(axis=2)
        return pd.Series(list(b))

    # Band IDS ONLY: the bucket self-join and the pair dedup shuffle
    # 16-byte id pairs, never the vectors (n_tables × vector payload
    # through two exchanges is the expensive wrong shape at 100 TB).
    # Vectors re-attach afterwards by id — broadcast at small corpora
    # under AQE, a co-partitioned join at scale.
    banded = vectors.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_buckets(F.col(vec_col))).alias("_tbl", "_bkt"),
    )
    a = banded.alias("a").hint("shuffle_hash")
    b = banded.alias("b").hint("shuffle_hash")
    pair_ids = (
        a.join(
            b,
            (F.col("a._tbl") == F.col("b._tbl"))
            & (F.col("a._bkt") == F.col("b._bkt"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    side = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    cand = (
        pair_ids.join(side, pair_ids["a_id"] == side["_id"])
        .drop("_id")
        .withColumnRenamed("_v", "_va")
        .join(side, F.col("b_id") == side["_id"])
        .drop("_id")
        .withColumnRenamed("_v", "_vb")
    )
    id_type = vectors.schema[id_col].dataType.simpleString()

    def _rescore(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.vstack(pdf["_va"].to_numpy()).astype(np.float64)
            B = np.vstack(pdf["_vb"].to_numpy()).astype(np.float64)
            seq_sum = lambda X: np.cumsum(X, axis=1)[:, -1]
            exact = seq_sum(A * B) / (
                np.sqrt(seq_sum(A * A)) * np.sqrt(seq_sum(B * B))
            )
            keep = exact >= threshold
            yield pd.DataFrame(
                {
                    "a_id": pdf["a_id"].to_numpy()[keep],
                    "b_id": pdf["b_id"].to_numpy()[keep],
                    "score": exact[keep],
                }
            )

    return cand.mapInPandas(
        _rescore, f"a_id {id_type}, b_id {id_type}, score double"
    )


def hyperplane_lsh_top_k(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 1,
    dim: int = 64,
    n_planes: int | None = None,
    n_tables: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_vectors: int | None = None,
    assumed_min_cosine: float = 0.5,
    query_id_col: str = "query_id",
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k: score only same-bucket (vector, query) pairs,
    over ``n_tables`` independent hyperplane tables for recall.

    Returns ``(query_id, neighbor_id, score, rank)`` like the exact op —
    drop-in, with recall controlled by (n_planes, n_tables).
    ``exclude_self`` drops identical-id pairs before ranking, matching
    :func:`brute_force_top_k`.

    All ``n_tables × n_planes`` signature bits per vector come from ONE
    Arrow-batched numpy matmul (``V @ H.T``) in a pandas UDF — the
    built-in array expressions (``aggregate``/``zip_with``) are
    interpreted per element and would evaluate 40 dot products per row;
    the matmul is vectorized and two orders of magnitude cheaper.  The
    hyperplane matrix is seeded driver-side (deterministic, a few KB in
    the UDF closure).  Buckets produced are bit-identical to
    :func:`hyperplane_signature`.  Candidate scoring is a second
    vectorized UDF; only same-bucket pairs are ever materialized, so at
    100 TB the corpus never cross-joins — it shuffles once on
    ``(table, bucket)``.

    When ``n_planes``/``n_tables`` are omitted they auto-size from the
    corpus count (:func:`auto_lsh_params`, recall floor at
    ``assumed_min_cosine``); pass ``n_vectors`` to skip the counting job.
    """
    from pyspark.sql.pandas.functions import pandas_udf

    if n_planes is None or n_tables is None:
        if n_vectors is None:
            n_vectors = vectors.count()
        auto_planes, auto_tables = auto_lsh_params(
            n_vectors, min_cosine=assumed_min_cosine
        )
        n_planes = n_planes if n_planes is not None else auto_planes
        n_tables = n_tables if n_tables is not None else auto_tables

    planes = np.array(
        [make_hyperplanes(dim, n_planes, seed=seed + 1000 * t) for t in range(n_tables)]
    )  # (T, P, dim)
    H = planes.reshape(n_tables * n_planes, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def _buckets(col: pd.Series) -> pd.Series:
        V = np.vstack(col.to_numpy()).astype(np.float64)  # (B, dim)
        bits = (V @ H.T) >= 0  # (B, T*P)
        b = (bits.reshape(len(V), n_tables, n_planes) * weights).sum(axis=2)
        return pd.Series(list(b))

    _cosine = cosine_pandas_udf()

    def banded(df: DataFrame, id_out: str, vec_out: str) -> DataFrame:
        return df.select(
            F.col(id_col if id_out == "neighbor_id" else query_id_col).alias(id_out),
            F.col(vec_col).alias(vec_out),
            F.posexplode(_buckets(F.col(vec_col))).alias("_tbl", "_bkt"),
        )

    vb = banded(vectors, "neighbor_id", "_vv")
    qb = banded(queries, "query_id", "_qv")
    scored = (
        vb.join(F.broadcast(qb), ["_tbl", "_bkt"])
        .select("query_id", "neighbor_id", "_qv", "_vv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        scored.select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("_qv"), F.col("_vv")).alias("score"),
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


def fit_ivf_pq(
    vectors: DataFrame,
    n_clusters: int = 16,
    m_sub: int = 8,
    k: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_fit_rows: int = 200_000,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit the IVF-PQ index structures (Jégou et al. 2011 §V — FAISS
    ``IndexIVFPQ``): the coarse quantizer on the bounded id-ordered
    driver sample, then product-quantization codebooks on the RESIDUALS
    ``x − centroid(x)`` of that same sample — residual energy is far
    smaller than vector energy, so the same code budget quantizes much
    more finely than plain PQ.  Returns ``(centers (C, d), codebooks
    (m_sub, k, d/m_sub))``; both are pure deterministic functions of the
    data, replayable by the SQL oracle."""
    pdf = (
        vectors.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(max_fit_rows)
        .toPandas()
    )
    X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    centers = fit_kmeans(X, n_clusters, seed=seed)
    R = X - centers[_sq_dists(X, centers).argmin(axis=1)]
    d = X.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    ds = d // m_sub
    books = np.stack(
        [
            fit_kmeans(R[:, j * ds : (j + 1) * ds], k, seed=seed + j)
            for j in range(m_sub)
        ]
    )
    return centers, books


#: persisted-prefit schema contract (pinned by save/load and pytest)
_PREFIT_CENTER_SCHEMA = {"cell": "int", "center": "array<double>"}
_PREFIT_BOOK_SCHEMA = {"subspace": "int", "code": "int", "center": "array<double>"}


def save_ivf_pq_prefit(spark, prefit: tuple, path: str) -> None:
    """Materialize a :func:`fit_ivf_pq` result as the on-disk artifact a
    production index keeps between query batches: two parquet datasets —
    ``centers/`` ``(cell, center)`` and ``codebooks/`` ``(subspace,
    code, center)``.  Values are float64; parquet DOUBLE round-trips
    them bit-exactly, so a reloaded prefit reproduces every ADC
    distance and therefore every ranked result (pinned in
    tests/test_index_persistence.py).  Sizes are tiny (nlist × d +
    m_sub × n_codes × d/m_sub doubles), so a single file each.

    Written with pyarrow directly: the prefit is DRIVER-RESIDENT numpy
    (kilobytes), and shipping it through createDataFrame's row
    conversion cost ~11 s of pure py4j overhead at the 100x layout
    (VERDICT r11 "What's wrong" #4 — measured in SCALE.md §19);
    the arrow write is milliseconds and `spark.read.parquet` reads the
    directory unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    centers, books = prefit
    m_sub, n_codes, _ = books.shape
    for sub, table in (
        (
            "centers",
            pa.table(
                {
                    "cell": pa.array(
                        range(len(centers)), type=pa.int32()
                    ),
                    "center": pa.array(
                        [c.tolist() for c in np.asarray(centers, float)],
                        type=pa.list_(pa.float64()),
                    ),
                }
            ),
        ),
        (
            "codebooks",
            pa.table(
                {
                    "subspace": pa.array(
                        [j for j in range(m_sub) for _ in range(n_codes)],
                        type=pa.int32(),
                    ),
                    "code": pa.array(
                        [c for _ in range(m_sub) for c in range(n_codes)],
                        type=pa.int32(),
                    ),
                    "center": pa.array(
                        [
                            books[j][c].astype(float).tolist()
                            for j in range(m_sub)
                            for c in range(n_codes)
                        ],
                        type=pa.list_(pa.float64()),
                    ),
                }
            ),
        ),
    ):
        d = f"{path}/{sub}"
        if os.path.isdir(d):  # overwrite semantics
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
        papq.write_table(table, f"{d}/part-00000.parquet")


def load_ivf_pq_prefit(spark, path: str) -> tuple[np.ndarray, np.ndarray]:
    """Reload a persisted :func:`save_ivf_pq_prefit` artifact as the
    ``(centers, codebooks)`` numpy pair :func:`ivf_pq_top_k` accepts via
    ``prefit=``.  Validates the schema contract and index contiguity at
    load (a drifted or truncated artifact fails here with a readable
    message, not as a wrong-shaped ranking downstream)."""
    cdf = spark.read.parquet(f"{path}/centers")
    bdf = spark.read.parquet(f"{path}/codebooks")
    for frame, want, what in (
        (cdf, _PREFIT_CENTER_SCHEMA, "centers"),
        (bdf, _PREFIT_BOOK_SCHEMA, "codebooks"),
    ):
        got = dict(frame.dtypes)
        if got != want:
            raise ValueError(
                f"ivf_pq prefit {what} schema drifted: {got} != {want}"
            )
    crows = sorted(cdf.collect(), key=lambda r: r.cell)
    if [r.cell for r in crows] != list(range(len(crows))):
        raise ValueError("ivf_pq prefit centers are not contiguous 0..C-1")
    centers = np.array([r.center for r in crows], dtype=np.float64)
    brows = sorted(bdf.collect(), key=lambda r: (r.subspace, r.code))
    m_sub = 1 + max(r.subspace for r in brows)
    n_codes = 1 + max(r.code for r in brows)
    if [(r.subspace, r.code) for r in brows] != [
        (j, c) for j in range(m_sub) for c in range(n_codes)
    ]:
        raise ValueError("ivf_pq prefit codebooks are not a dense grid")
    books = np.array([r.center for r in brows], dtype=np.float64).reshape(
        m_sub, n_codes, -1
    )
    return centers, books


def ivf_pq_query_lut(
    queries_np: np.ndarray,
    centers: np.ndarray,
    codebooks: np.ndarray,
    probe_cells: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-(query, cell) asymmetric-distance table over residual
    codebooks, micro-quantized: ``lut[q, cell, j, c] = round(1e6 *
    ||(q − center_cell)_j − books[j][c]||²)``.  The residual subtraction
    is exact float64 arithmetic; quantizing each entry before summation
    makes every ADC distance an exact integer sum (the
    :func:`pq_query_lut` contract, extended by the cell axis).  Shared
    by :func:`ivf_pq_top_k` and its oracle generator.

    With ``probe_cells`` (shape ``(n_q, n_probe)``), only each query's
    probed cells are materialized — shape ``(n_q, n_probe, m_sub,
    n_codes)``, indexed by probe SLOT instead of cell id.  At an
    auto-sized nlist the full table is ``Q × nlist × 128`` int64s
    (gigabytes shipped into every task closure); the probed slice is
    ``nlist/n_probe``× smaller with bit-identical entries."""
    n_q = len(queries_np)
    m_sub, n_codes, ds = codebooks.shape
    if probe_cells is None:
        n_cells = len(centers)
        lut = np.empty((n_q, n_cells, m_sub, n_codes), dtype=np.int64)
        for cell in range(n_cells):
            QR = queries_np - centers[cell]
            for j in range(m_sub):
                lut[:, cell, j, :] = _lut_block(
                    QR[:, j * ds : (j + 1) * ds], codebooks[j]
                )
        return lut
    n_probe = probe_cells.shape[1]
    lut = np.empty((n_q, n_probe, m_sub, n_codes), dtype=np.int64)
    for slot in range(n_probe):
        QR = queries_np - centers[probe_cells[:, slot]]
        for j in range(m_sub):
            lut[:, slot, j, :] = _lut_block(
                QR[:, j * ds : (j + 1) * ds], codebooks[j]
            )
    return lut


def ivf_pq_top_k(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_clusters: Optional[int] = None,
    n_probe: Optional[int] = None,
    m_sub: int = 8,
    n_codes: Optional[int] = None,
    shortlist: Optional[int] = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
    max_fit_rows: int = 200_000,
    prefit: Optional[tuple] = None,
) -> DataFrame:
    """IVF-PQ ANN (Jégou et al. 2011 §V; the FAISS ``IndexIVFPQ``
    layout): coarse-quantize the corpus into cells, PQ-encode each
    vector's RESIDUAL, and answer queries by probing ``n_probe`` cells —
    ADC-ranking only those cells' codes with the per-(query, cell)
    residual LUT — then exact-cosine re-rank the shortlist.  This is the
    canonical billion-scale configuration: per-query work is
    ``n_probe/n_clusters`` of the corpus read at 128x compression plus a
    ``Q·shortlist`` full-precision gather.

    Returns ``(query_id, neighbor_id, score, rank)`` — drop-in with the
    exact op; recall governed by ``n_probe`` and ``shortlist``.

    Scale shape: one corpus pass assigns cells and encodes residual
    codes (Arrow matmuls, map-only); the encoded corpus then shuffles
    ONCE on its cell key — the IVF partition layout — into a
    cell-at-a-time ``applyInPandas`` scorer (the FAISS inverted-list
    scan): each cell's code matrix is ADC-scored against every query
    probing it with numpy gathers, so a corpus row crosses the Arrow
    boundary once (never once per probing query) and only flat
    ``(query, id, adist)`` integer rows reach the shortlist window.
    The task closure ships only the query matrix, centers, codebooks,
    and the cell→queries map (MBs); micro-LUT rows are computed
    executor-side per (cell, probing queries) instead of the driver
    materializing the full ``Q·n_probe·m_sub·n_codes`` table (gigabytes
    at serving query counts with 8-bit books).  All ADC distances are
    exact integer sums of micro-quantized LUT entries — the same numpy
    expression :func:`ivf_pq_query_lut` evaluates — so the oracle
    replays ranking bit-for-bit from pinned centroids, codebooks,
    probes, and LUT (oracle ``similarity_ivf_pq``).

    ``n_clusters``/``n_probe`` default to :func:`auto_ivf_params` of the
    corpus count — nlist ~ 4·sqrt(N) keeps per-query candidate work
    SUBLINEAR in the corpus; pass explicit values to pin a layout (the
    oracle-checked registry entry pins the 16/4 default shape).

    ``shortlist`` defaults to ``max(50, 2·⌊√N⌋)``.  History: under the
    r7-era 4-bit books the recall ceiling was the ADC noise floor
    crowding true neighbors out of a fixed-50 shortlist (50→800 moved
    recall@3 0.31→0.53), which set this growing default; the r8 8-bit
    knee grid (SCALE.md §10, SWEEP_IVF_PQ.json) shows the regime
    inverted — recall is now probe-coverage-bound and shortlist 400→894
    buys only +0.015 — but the 2·√N budget stays because the
    cell-at-a-time scorer makes its marginal cost ~nil (+1 s at 100x)
    and it keeps headroom on noisier corpora.  The exact re-rank gather
    stays ``Q·shortlist`` rows, sublinear in N.

    ``n_codes`` defaults to :func:`auto_pq_codes`: 4-bit books on small
    corpora, the canonical FAISS 8-bit books once the bounded fit sample
    can train them — attacking the same ADC noise floor at the source
    (16x finer residual quantization at identical per-vector ADC cost)."""
    if (
        n_clusters is None
        or n_probe is None
        or shortlist is None
        or n_codes is None
    ):
        n_vec = vectors.count()
        if n_clusters is None or n_probe is None:
            auto_c, auto_p = auto_ivf_params(n_vec)
            n_clusters = auto_c if n_clusters is None else n_clusters
            n_probe = auto_p if n_probe is None else n_probe
        if shortlist is None:
            shortlist = max(50, 2 * int(math.isqrt(n_vec)))
        if n_codes is None:
            n_codes = auto_pq_codes(n_vec)

    # train-once / search-many (the FAISS index lifecycle): pass
    # ``prefit=(centers, codebooks)`` from a prior fit_ivf_pq to serve
    # repeated query batches without re-running the k-means fit —
    # identical results to the inline fit for the same layout/seed.
    if prefit is not None:
        centers, books = prefit
        # the prefit structures ARE the layout (ADVICE r8): a prefit
        # trained with a different m_sub/n_codes than the keyword
        # defaults would otherwise encode/score over the wrong subspace
        # slices — derive both from the codebook tensor instead.
        m_sub = books.shape[0]
        n_codes = books.shape[1]
    else:
        centers, books = fit_ivf_pq(
            vectors,
            n_clusters=n_clusters,
            m_sub=m_sub,
            k=n_codes,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
            max_fit_rows=max_fit_rows,
        )
    ds = books.shape[2]

    q_pdf = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).toPandas()
    qids = q_pdf["query_id"].to_numpy()
    Q = np.vstack(q_pdf["_qv"].to_numpy()).astype(np.float64)
    probe_cells = np.argsort(_sq_dists(Q, centers), axis=1, kind="stable")[
        :, :n_probe
    ]
    id_type = vectors.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()

    def _encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            cell = _sq_dists(V, centers).argmin(axis=1)
            R = V - centers[cell]
            codes = np.empty((len(V), m_sub), dtype=np.int32)
            for j in range(m_sub):
                codes[:, j] = _sq_dists(
                    R[:, j * ds : (j + 1) * ds], books[j]
                ).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].to_numpy(),
                    "_cell": cell.astype(np.int32),
                    "_codes": list(codes),
                }
            )

    encoded = vectors.select(id_col, vec_col).mapInPandas(
        _encode, f"neighbor_id {id_type}, _cell int, _codes array<int>"
    )

    # CELL-AT-A-TIME ADC (the FAISS inverted-list scan shape): group the
    # encoded corpus by cell — ONE shuffle, whole cells per group — and
    # score each cell's code matrix against every query probing it with
    # numpy gathers.  Replaces the r7 probe-join + per-candidate-row UDF:
    # that path replicated every corpus row per probing query through an
    # Arrow boundary (Q·n_probe·cell rows, each carrying its m_sub-code
    # ARRAY — object-array conversion dominated the 100x wall) and paid
    # a python dict lookup per candidate.  Here each corpus row crosses
    # Arrow ONCE (inside its cell group), the candidate fan-out exists
    # only as a numpy (queries × cell) integer matrix, and the emitted
    # rows are flat int/id columns.  The task closure ships queries +
    # centers + codebooks + the cell→queries map (~MBs).  ADC values are
    # bit-identical to the oracle's pinned LUT: same per-(query, cell)
    # _lut_block rows (shape-invariant — see its docstring), same exact
    # integer sums.
    cell_to_q: dict[int, np.ndarray] = {}
    for slot in range(probe_cells.shape[1]):
        for qi, cell in enumerate(probe_cells[:, slot]):
            cell_to_q.setdefault(int(cell), []).append(qi)
    cell_to_q = {c: np.asarray(v, dtype=np.int64) for c, v in cell_to_q.items()}

    out_schema = (
        f"query_id {qid_type}, neighbor_id {id_type}, _adist long"
    )

    def _score_cell(key, pdf):
        qidx = cell_to_q.get(int(key[0]))
        if qidx is None or not len(pdf):
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "_adist": []}
            )
        cell = int(key[0])
        nb = pdf["neighbor_id"].to_numpy()
        C = np.vstack(pdf["_codes"].to_numpy())
        QR = Q[qidx] - centers[cell]
        D = np.zeros((len(qidx), len(nb)), dtype=np.int64)
        for j in range(m_sub):
            # _lut_block, NOT _sq_dists: the oracle LUT is built over a
            # different row subset, and only the shape-invariant
            # expression guarantees the same (query, cell) row rounds
            # to the same bits in both calls (see _lut_block docstring).
            lut_j = _lut_block(QR[:, j * ds : (j + 1) * ds], books[j])
            D += lut_j[:, C[:, j]]
        out = pd.DataFrame(
            {
                "query_id": np.repeat(qids[qidx], len(nb)),
                "neighbor_id": np.tile(nb, len(qidx)),
                "_adist": D.ravel(),
            }
        )
        if exclude_self:
            out = out[out["query_id"] != out["neighbor_id"]]
        return out

    cand = encoded.groupBy("_cell").applyInPandas(_score_cell, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("_adist").asc(), F.col("neighbor_id").asc()
    )
    shortlisted = (
        cand.withColumn("_srn", F.row_number().over(w))
        .filter(F.col("_srn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(
        shortlisted, vectors, queries, k, id_col, vec_col, query_id_col
    )


def ivf_dedup_batch(
    corpus: DataFrame,
    batch: DataFrame,
    prefit: tuple,
    threshold: float = 0.4,
    n_probe: int = 4,
    shortlist: Optional[int] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """INCREMENTAL embedding dedup — the vector counterpart of
    ``minhash_probe`` (VERDICT r12 #2): probe a NEW batch of embeddings
    against an INDEXED corpus through a persisted IVF(-PQ) prefit
    (:func:`load_ivf_pq_prefit`), so the daily pipeline dedups today's
    vectors against yesterday's index without re-fitting or re-scanning
    cross-pairs.  Returns ``(batch_id, index_id, cosine)`` for every
    probed pair at/above ``threshold`` — callers anti-join ``batch_id``
    to drop the near-duplicates.

    Candidate discovery is the IVF layout: corpus vectors live in their
    nearest-centroid cell (one map-only assignment pass + ONE shuffle on
    the cell key); each batch vector probes its ``n_probe`` nearest
    cells, so per-batch-vector work is ``n_probe/n_clusters`` of the
    corpus — recall is probe-coverage-bound exactly as in
    :func:`ivf_pq_top_k` (floor pinned in tests/test_pq.py), precision
    is 1 (every emitted pair carries its EXACT cosine, the strict
    sequential fold shared with :func:`cosine`).

    ``shortlist = S`` (the 100 TB path) bounds the full-precision work:
    inside each cell the batch vector's candidates are pre-ranked by
    ADC over the prefit's residual PQ codes (the
    :func:`ivf_pq_query_lut` arithmetic) and only the top ``S`` are
    exact-rescored — the corpus side then reads 128x-compressed codes,
    touching full vectors only for ``S`` candidates per batch vector.
    With ``shortlist=None`` every probed-cell candidate is rescored
    (the mode the DuckDB oracle replays literally; shortlist-mode
    equivalence at a generous S is pinned in tests/test_pq.py).

    Scale shape: no driver collect of either side — the batch explodes
    to ``n_probe`` cell-keyed rows and cogroups with the corpus cells
    (``applyInPandas`` over the two frames); the closure ships only
    centers + codebooks (kilobytes).  At a skewed cell the group is one
    numpy matmul over (batch-in-cell × cell) — the same bound as the
    IVF serving scan."""
    encoded = _ivf_encode_frame(
        corpus, prefit, id_col, vec_col,
        with_codes=shortlist is not None,
    ).select(
        F.col("vec_id").alias("index_id"),
        F.col("embedding").alias("_v"),
        F.col("codes").alias("_codes"),
        F.col("cell").alias("_cell"),
    )
    probing = _ivf_probe_frame(batch, prefit, n_probe, id_col, vec_col)
    return _score_probed_cells(probing, encoded, prefit, threshold, shortlist)


def _ivf_encode_frame(
    vectors: DataFrame,
    prefit: tuple,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_codes: bool = True,
) -> DataFrame:
    """THE IVF encode kernel — cell assignment + residual PQ codes as
    one map-only pass, defined ONCE for every producer of the encoded
    layout (:func:`save_ivf_corpus_index`,
    :func:`append_to_ivf_corpus_index`, the streaming vector gate, and
    :func:`ivf_dedup_batch`'s inline side): the stores these writers
    share stay mutually consistent because there is exactly one
    arithmetic to drift.  ``with_codes=False`` (the exact-rescore probe,
    which never reads codes) emits empty code arrays instead of paying
    the residual argmins and shuffling dead bytes.  Output columns:
    ``(vec_id, embedding, codes, cell)``; the id type follows the input
    frame."""
    centers, books = prefit
    m_sub, _, ds = books.shape
    id_type = vectors.schema[id_col].dataType.simpleString()

    def _enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            cell = _sq_dists(V, centers).argmin(axis=1)
            if with_codes:
                R = V - centers[cell]
                codes = np.empty((len(V), m_sub), dtype=np.int32)
                for j in range(m_sub):
                    codes[:, j] = _sq_dists(
                        R[:, j * ds : (j + 1) * ds], books[j]
                    ).argmin(axis=1)
            else:
                codes = np.zeros((len(V), 0), dtype=np.int32)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "embedding": list(V),
                    "codes": list(codes),
                    "cell": cell.astype(np.int32),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        _enc,
        f"vec_id {id_type}, embedding array<double>, codes array<int>, "
        "cell int",
    )


def _ivf_probe_frame(
    batch: DataFrame,
    prefit: tuple,
    n_probe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """THE probe-explosion kernel — each batch vector's ``n_probe``
    nearest cells as ``(batch_id, _cell, _v)`` rows, defined once for
    the inline and store-backed probes (and the streaming gate).  The
    id type follows the input frame."""
    centers, _ = prefit
    id_type = batch.schema[id_col].dataType.simpleString()

    def _pr(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            B = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            probes = np.argsort(
                _sq_dists(B, centers), axis=1, kind="stable"
            )[:, :n_probe]
            yield pd.DataFrame(
                {
                    "batch_id": np.repeat(
                        pdf[id_col].to_numpy(), n_probe
                    ),
                    "_cell": probes.ravel().astype(np.int32),
                    "_v": list(np.repeat(B, n_probe, axis=0)),
                }
            )

    return batch.select(id_col, vec_col).mapInPandas(
        _pr, f"batch_id {id_type}, _cell int, _v array<double>"
    )


def _score_probed_cells(
    probing: DataFrame,
    encoded: DataFrame,
    prefit: tuple,
    threshold: float,
    shortlist: Optional[int],
) -> DataFrame:
    """Shared cell-at-a-time cogroup scorer for the incremental
    embedding probe — defined ONCE so :func:`ivf_dedup_batch` (inline
    corpus) and :func:`probe_ivf_corpus_index` (persisted encoded
    store) emit bit-identical pairs for the same data.  ``probing`` is
    ``(batch_id, _cell, _v)`` (one row per probed cell), ``encoded`` is
    ``(index_id, _cell, _v, _codes)``."""
    centers, books = prefit
    m_sub, n_codes, ds = books.shape

    def _score_cell(key, bpdf, ipdf):
        empty = pd.DataFrame({"batch_id": [], "index_id": [], "cosine": []})
        if not len(bpdf) or not len(ipdf):
            return empty
        B = np.vstack(bpdf["_v"].to_numpy())
        I = np.vstack(ipdf["_v"].to_numpy())
        b_ids = bpdf["batch_id"].to_numpy()
        i_ids = ipdf["index_id"].to_numpy()
        seq_sum = lambda M: np.cumsum(M, axis=1)[:, -1]
        b_norms = np.sqrt(seq_sum(B * B))
        i_norms = np.sqrt(seq_sum(I * I))
        if shortlist is not None and len(i_ids) > shortlist:
            # ADC pre-rank against the cell's PQ codes (the compressed
            # read): keep each batch vector's top-S candidates only,
            # then ONE strict-fold pass scores and thresholds them —
            # the fold IS the exact value, so no second rescore
            cell = int(key[0])
            C = np.vstack(ipdf["_codes"].to_numpy())
            QR = B - centers[cell]
            D = np.zeros((len(B), len(i_ids)), dtype=np.int64)
            for j in range(m_sub):
                lut_j = _lut_block(QR[:, j * ds : (j + 1) * ds], books[j])
                D += lut_j[:, C[:, j]]
            rows = np.repeat(np.arange(len(B)), shortlist)
            cols = np.argsort(D, axis=1, kind="stable")[:, :shortlist].ravel()
            exact = seq_sum(B[rows] * I[cols]) / (
                b_norms[rows] * i_norms[cols]
            )
            keep = exact >= threshold
            return pd.DataFrame(
                {
                    "batch_id": b_ids[rows[keep]],
                    "index_id": i_ids[cols[keep]],
                    "cosine": exact[keep],
                }
            )
        # exact mode (oracle-replayable): BLAS prefilter at
        # threshold − 1e-6 over batch-row TILES — the (tile × cell)
        # score block stays bounded instead of materializing the
        # full (batch-in-cell × cell) matrix at large cells
        It = np.ascontiguousarray(I.T)
        tile = max(1, int(50_000_000 / max(1, len(i_ids))))
        parts = []
        for lo in range(0, len(B), tile):
            hi = lo + tile
            approx = (B[lo:hi] @ It) / np.outer(
                b_norms[lo:hi], i_norms
            )
            r, c = np.nonzero(approx >= threshold - 1e-6)
            parts.append((r + lo, c))
        rows = np.concatenate([r for r, _ in parts])
        cols = np.concatenate([c for _, c in parts])
        if not len(rows):
            return empty
        # strict-fold rescore of surviving candidates only (the
        # _exact_rescored_pairs discipline — emitted scores are
        # bit-identical to the sequential-fold oracle)
        exact = seq_sum(B[rows] * I[cols]) / (b_norms[rows] * i_norms[cols])
        keep = exact >= threshold
        return pd.DataFrame(
            {
                "batch_id": b_ids[rows[keep]],
                "index_id": i_ids[cols[keep]],
                "cosine": exact[keep],
            }
        )

    # each id column types after ITS OWN side (ADVICE r13: typing
    # index_id from the probing side forced the persisted store's
    # contract-pinned bigint ids through the caller batch's id type —
    # an int-batch probe of a 64-bit store would arrow-cast-error or
    # overflow)
    b_type = dict(probing.dtypes)["batch_id"]
    i_type = dict(encoded.dtypes)["index_id"]
    out_schema = f"batch_id {b_type}, index_id {i_type}, cosine double"
    return (
        probing.groupBy("_cell")
        .cogroup(encoded.groupBy("_cell"))
        .applyInPandas(_score_cell, out_schema)
    )


#: encoded-corpus artifact schema contract (pinned by save/load/pytest)
_CORPUS_INDEX_SCHEMA = {
    "vec_id": "bigint",
    "embedding": "array<double>",
    "codes": "array<int>",
    "cell": "int",
}


def save_ivf_corpus_index(
    corpus: DataFrame,
    prefit: tuple,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the ENCODED corpus — the vector-index artifact a daily
    pipeline keeps between probes, completing the lifecycle symmetry
    with the MinHash side (save/load/probe/append/compact): the prefit
    (:func:`save_ivf_pq_prefit`) stores only the QUANTIZER, so a probe
    through it still re-encodes every corpus vector per run — one full
    corpus read per day, the cost this artifact exists to amortize.
    Here the corpus is encoded ONCE (cell assignment + residual PQ
    codes, one map-only pass) and written hive-partitioned BY CELL
    under ``path/encoded`` — the IVF inverted-list layout as the
    physical layout — alongside the prefit, so
    :func:`probe_ivf_corpus_index` reads only its batch's probed cells
    (a partition-pruned scan of ~``n_probe/nlist`` of the store, the
    ``bucket_partitions`` discipline applied to vectors).

    The store carries the FULL-PRECISION vectors alongside the codes
    because the dedup contract is an exact-cosine verdict — the
    probed-cell read is already the pruned fraction, and ``shortlist``
    bounds how many of those vectors are exactly folded.  A deployment
    that cannot afford vector bytes in the index would store codes
    only and gather shortlisted candidates' vectors from the base
    table by id (the :func:`ivf_pq_top_k` re-rank shape) — same
    verdicts, one extra point-lookup join."""
    _ivf_encode_frame(corpus, prefit, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{path}/encoded")
    save_ivf_pq_prefit(corpus.sparkSession, prefit, path)


def load_ivf_corpus_index(spark, path: str, exclude_writer=None):
    """Reload the encoded-corpus artifact: ``(prefit, encoded_frame)``
    with the schema contract validated at load (the
    :func:`load_minhash_index` discipline) and a half-finished
    compaction swap repaired first.  A store maintained by the
    STREAMING vector gate carries a writer ``batch_id`` column in its
    appended files (the replay-leak exclusion key); batch readers
    tolerate and DROP it — an explicit ``mergeSchema`` read, because
    plain schema inference samples one file and would make the
    column's presence (and thus validation) nondeterministic on a
    mixed seeded+streamed store.

    ``exclude_writer`` (VERDICT r14 #5): drop rows APPENDED under that
    writer id (``append_to_ivf_corpus_index(..., writer_id=...)``) —
    the day-granularity replay-leak exclusion, null-safe so untagged
    bootstrap/append rows stay probe-visible (the
    ``load_minhash_index`` twin)."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        _recover_halfswap,
    )

    for sub in ("encoded", "centers", "codebooks"):
        _recover_halfswap(f"{path}/{sub}")
    prefit = load_ivf_pq_prefit(spark, path)
    encoded = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/encoded"
    )
    got = dict(encoded.dtypes)
    if got.pop("batch_id", "bigint") != "bigint":
        raise ValueError(
            "ivf corpus index schema drifted: batch_id is not bigint"
        )
    if exclude_writer is not None and "batch_id" in encoded.columns:
        encoded = encoded.filter(
            ~F.col("batch_id").eqNullSafe(
                F.lit(int(exclude_writer)).cast("long")
            )
        )
    encoded = encoded.drop("batch_id")
    if got != _CORPUS_INDEX_SCHEMA:
        raise ValueError(
            f"ivf corpus index schema drifted: {got} != "
            f"{_CORPUS_INDEX_SCHEMA}"
        )
    return prefit, encoded


def append_to_ivf_corpus_index(
    path: str,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    writer_id=None,
) -> None:
    """Daily index UPDATE for the vector artifact — the
    :func:`append_to_minhash_index` counterpart: encode the new vectors
    with the artifact's OWN persisted prefit (cell assignment and codes
    stay mutually consistent forever — a re-fit would silently shear
    the cell layout) and append them into the cell partitions.  Only
    the new vectors are touched; the store is never read or
    rewritten.

    ``writer_id`` (VERDICT r14 #5) tags the appended rows with a writer
    ``batch_id`` — the day-granularity replay-leak exclusion key (see
    ``append_to_minhash_index``); a tagged store must thereafter be
    compacted with a batch_id-preserving rewrite, never the batch
    :func:`compact_ivf_corpus_index` (which refuses it)."""
    spark = vectors.sparkSession
    prefit, _ = load_ivf_corpus_index(spark, path)  # validates layout
    enc = _ivf_encode_frame(vectors, prefit, id_col, vec_col)
    if writer_id is not None:
        enc = enc.withColumn(
            "batch_id", F.lit(int(writer_id)).cast("long")
        )
    enc.write.mode("append").partitionBy("cell").parquet(
        f"{path}/encoded"
    )


def compact_ivf_corpus_index(
    spark, path: str, target_files: int = 4
) -> None:
    """Offline maintenance for the encoded-corpus artifact: fold the
    per-day append files (per cell partition) behind the same
    crash-recoverable swap the MinHash stores use.  A store the
    STREAMING vector gate maintains (non-null writer ``batch_id`` rows)
    is REFUSED — this rewrite's fixed schema would erase the gate's
    replay-leak exclusion key (ADVICE r13); use the gate's own
    ``compact()``."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        _refuse_live_gate_store,
        _swap_compact_store,
    )

    load_ivf_corpus_index(spark, path)  # validates before rewriting
    _refuse_live_gate_store(
        spark, f"{path}/encoded", "compact_ivf_corpus_index"
    )
    _swap_compact_store(
        spark,
        f"{path}/encoded",
        "vec_id BIGINT, embedding ARRAY<DOUBLE>, codes ARRAY<INT>, "
        "cell INT",
        target_files,
        "cell",
    )


def probe_ivf_corpus_index(
    spark,
    path: str,
    batch: DataFrame,
    threshold: float = 0.4,
    n_probe: int = 4,
    shortlist: Optional[int] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_writer=None,
) -> DataFrame:
    """Daily probe against the PERSISTED encoded corpus: load the
    prefit (driver-resident KBs), collect the batch's probed-cell set
    (≤ nlist values), and push an ``isin`` PARTITION filter into the
    encoded-store scan — the probe reads ~``n_probe/nlist`` of the
    stored corpus instead of re-encoding all of it
    (:func:`_pruned_index_buckets`'s pruning discipline on the vector
    side; the filter reaching the scan is pinned in tests/test_pq.py).
    Scoring semantics are EXACTLY :func:`ivf_dedup_batch`'s — same
    probe assignment, same strict-fold cosine, same optional ADC
    shortlist — so the same DuckDB oracle replays both paths.
    ``exclude_writer`` passes through to :func:`load_ivf_corpus_index`
    (the day-granularity replay-leak exclusion)."""
    prefit, encoded = load_ivf_corpus_index(
        spark, path, exclude_writer=exclude_writer
    )
    probing = _ivf_probe_frame(
        batch, prefit, n_probe, id_col, vec_col
    ).localCheckpoint(eager=True)
    cells = [
        r[0] for r in probing.select("_cell").distinct().collect()
    ]
    pruned = encoded.filter(F.col("cell").isin(cells)).select(
        F.col("vec_id").alias("index_id"),
        F.col("embedding").alias("_v"),
        F.col("codes").alias("_codes"),
        F.col("cell").alias("_cell"),
    )
    return _score_probed_cells(
        probing, pruned, prefit, threshold, shortlist
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.4,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocks_per_cell: int = 4,
    max_fit_rows: int = 200_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by clustering
    the embedding corpus with the deterministic k-means quantizer and
    pruning near-duplicates WITHIN each cluster only — the published
    recipe for corpus-scale semantic dedup, turning the O(N²) all-pairs
    problem into C independent O((N/C)²) cell problems.

    Returns one row per vector: ``(id, cell, kept)``.  The drop rule is
    the repo's deterministic min-id convention: a vector is dropped iff
    some SAME-CELL vector with a smaller id scores ``>= threshold``
    against it (the paper keeps one exemplar per ε-ball; min-id makes the
    choice reproducible and oracle-replayable — the paper's
    keep-least-central variant changes which exemplar survives, not the
    mechanics).  Cross-cell near-duplicates are intentionally out of
    scope (the paper's approximation); recall vs the exact pair set is
    measured in tests/test_phase2.py.

    Scale shape: the centroid fit is the bounded driver-side IVF contract
    (:func:`fit_ivf_centroids`); assignment is one Arrow matmul over the
    corpus; within-cell scoring reuses the block-matrix machinery of
    :func:`cosine_near_dup_pairs` keyed on ``(cell, block)`` — cells
    score independently and in parallel, each block-pair task one BLAS
    matmul, and only dropped ids cross back over Arrow.  At 100 TB the
    cell is the partition key, exactly the IVF layout."""
    centers = fit_ivf_centroids(
        vectors,
        n_clusters,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        max_fit_rows=max_fit_rows,
    )
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("int")
    def _assign(col: pd.Series) -> pd.Series:
        V = np.vstack(col.to_numpy()).astype(np.float64)
        return pd.Series(_sq_dists(V, centers).argmin(axis=1).astype(np.int32))

    assigned = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        _assign(F.col(vec_col)).alias("cell"),
    ).localCheckpoint(eager=True)

    id_type = vectors.schema[id_col].dataType.simpleString()
    packed = (
        assigned.select(
            "cell",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks_per_cell)).alias(
                "_blk"
            ),
            F.struct(
                F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
            ).alias("_r"),
        )
        .groupBy("cell", "_blk")
        .agg(F.collect_list("_r").alias("_rows"))
    )
    a = packed.select(
        "cell", F.col("_blk").alias("_ba"), F.col("_rows").alias("_rows_a")
    )
    b = packed.select(
        "cell", F.col("_blk").alias("_bb"), F.col("_rows").alias("_rows_b")
    )
    block_pairs = a.join(b, ["cell"]).filter(F.col("_ba") <= F.col("_bb"))
    block_pairs = block_pairs.repartition(
        vectors.sparkSession.sparkContext.defaultParallelism
    )

    def _unpack(rows):
        ids = np.asarray([r["id"] for r in rows])
        M = np.vstack([r["v"] for r in rows]).astype(np.float64)
        return ids, M

    def _dropped(batches):
        for pdf in batches:
            for rows_a, rows_b, same in zip(
                pdf["_rows_a"], pdf["_rows_b"], pdf["_ba"] == pdf["_bb"]
            ):
                A_ids, A = _unpack(rows_a)
                B_ids, B = (A_ids, A) if same else _unpack(rows_b)
                parts = [_exact_rescored_pairs(A_ids, A, B_ids, B, threshold)]
                if not same:
                    parts.append(
                        _exact_rescored_pairs(B_ids, B, A_ids, A, threshold)
                    )
                parts = [p for p in parts if p is not None and len(p)]
                if parts:
                    yield pd.concat(parts, ignore_index=True)[["b_id"]].rename(
                        columns={"b_id": "dropped_id"}
                    )

    dropped = (
        block_pairs.mapInPandas(_dropped, f"dropped_id {id_type}")
        .distinct()
    )
    return (
        assigned.join(
            dropped, assigned[id_col] == dropped["dropped_id"], "left"
        )
        .select(
            F.col(id_col),
            F.col("cell"),
            F.col("dropped_id").isNull().alias("kept"),
        )
    )


def quantize_embeddings_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the memory-side lever of
    ANN at scale: codes shrink a float32 corpus 4x (float64 8x), so 4x
    more vectors fit per executor and per shuffle block, at a recall cost
    the rescoring pass (``_exact_rescored_pairs``) already absorbs.

    Each vector scales by its own max-abs: ``q_i = round(127 * x_i /
    max_abs)``, emitted posexploded as ``(id, dim, q, scale)`` with
    ``scale = max_abs / 127`` (the dequantization factor, one double per
    vector).  Approximate dot products then run entirely on int8 codes:
    ``dot(a, b) ~ scale_a * scale_b * sum(qa_i * qb_i)`` with exact
    integer accumulation.

    All-zero vectors quantize to all-zero codes with ``scale = 0``.
    Map-only, no shuffle, no UDF; one IEEE divide + round per component,
    so DuckDB replays the codes exactly (oracle ``embedding_quantize``).
    """
    v = _as_double(F.col(vec_col))
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    safe = F.when(max_abs == 0.0, F.lit(1.0)).otherwise(max_abs)
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                v,
                lambda x: F.round(x * F.lit(127.0) / safe, 0).cast("int"),
            )
        ).alias("dim", "q"),
        (max_abs / F.lit(127.0)).alias("scale"),
    )


def fit_pq_codebooks(
    vectors: DataFrame,
    m_sub: int = 8,
    k: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_fit_rows: int = 200_000,
) -> np.ndarray:
    """Fit product-quantization codebooks (Jégou et al. 2011): split the
    vector into ``m_sub`` contiguous subvectors and run the deterministic
    Lloyd's fit (:func:`fit_kmeans`, seed offset per subspace) on each —
    the same bounded id-ordered driver-side sample contract as
    :func:`fit_ivf_centroids`, so the codebooks are a pure function of
    the data and the SQL oracle can replay them as literals.

    Returns an ``(m_sub, k, d/m_sub)`` array."""
    pdf = (
        vectors.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(max_fit_rows)
        .toPandas()
    )
    X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    d = X.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    ds = d // m_sub
    return np.stack(
        [
            fit_kmeans(X[:, j * ds : (j + 1) * ds], k, seed=seed + j)
            for j in range(m_sub)
        ]
    )


def pq_query_lut(queries_np: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Per-query asymmetric-distance lookup table, quantized to exact
    micro-unit integers: ``lut[q, j, c] = round(1e6 * ||q_j - c_{j,c}||²)``.

    Quantizing each entry BEFORE summation (the micro-unit bridge used by
    the LM scores and embedding centroids) makes the per-vector ADC
    distance an exact integer sum of ``m_sub`` table entries — both
    engines agree bit-for-bit, and the oracle can pin the table as SQL
    literals.  Shared by :func:`pq_top_k` and its oracle generator so the
    two tables are produced by the identical numpy calls."""
    m_sub, _, ds = codebooks.shape
    lut = np.empty((len(queries_np), m_sub, codebooks.shape[1]), dtype=np.int64)
    for j in range(m_sub):
        lut[:, j, :] = np.rint(
            1e6 * _sq_dists(queries_np[:, j * ds : (j + 1) * ds], codebooks[j])
        ).astype(np.int64)
    return lut


def pq_top_k(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
) -> DataFrame:
    """ADC top-k search (Jégou et al. 2011 §IV): rank the corpus for each
    query by PQ-approximated squared distance, computed entirely from the
    compressed codes — ``d(q, x) ≈ Σ_j lut[q, j, code_j(x)]``, ``m_sub``
    integer table lookups per (query, vector) instead of a ``d``-dim
    float dot product.  Returns ``(query_id, neighbor_id, adist_micro,
    rank)`` ascending by distance, ties on neighbor id.

    Scale shape: the (small, by contract) query set becomes an
    ``(Q, m_sub, k)`` integer LUT in the task closure; each corpus
    partition is encoded and scored in one Arrow-batched ``mapInPandas``
    pass and emits only its per-query partial top-k (keeping boundary
    ties, so global ranking over the partials is exact) — the shuffle
    carries O(parts · Q · k) rows, never the corpus.  At billion scale
    the corpus side would read PRE-ENCODED codes (``pq_encode`` output,
    128x smaller); here encoding is fused into the scan to keep the
    operator one-pass.

    All distances are exact integer sums of micro-quantized LUT entries
    (:func:`pq_query_lut`), so the DuckDB oracle replays the ranking
    bit-for-bit from the pinned codebooks + pinned LUT
    (oracle ``similarity_pq_adc``)."""
    q_pdf = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).toPandas()
    qids = q_pdf["query_id"].to_numpy()
    Q = np.vstack(q_pdf["_qv"].to_numpy()).astype(np.float64)
    m_sub, _, ds = codebooks.shape
    lut = pq_query_lut(Q, codebooks)

    id_type = vectors.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    out_schema = (
        f"query_id {qid_type}, neighbor_id {id_type}, adist_micro bigint"
    )

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            nb = pdf[id_col].to_numpy()
            codes = np.empty((len(V), m_sub), dtype=np.int64)
            for j in range(m_sub):
                codes[:, j] = _sq_dists(
                    V[:, j * ds : (j + 1) * ds], codebooks[j]
                ).argmin(axis=1)
            # D[q, n] = Σ_j lut[q, j, codes[n, j]] — exact int64
            D = np.zeros((len(qids), len(V)), dtype=np.int64)
            for j in range(m_sub):
                D += lut[:, j, codes[:, j]]
            frames = []
            for qi in range(len(qids)):
                col, ids = D[qi], nb
                if exclude_self:
                    keep = ids != qids[qi]
                    col, ids = col[keep], ids[keep]
                if len(col) > k:
                    # keep everything at or under the k-th smallest value
                    # (boundary ties included) so the global rank cannot
                    # need a row this partial pruned away
                    bound = np.partition(col, k - 1)[k - 1]
                    keep = col <= bound
                    col, ids = col[keep], ids[keep]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(qids[qi], len(col)),
                            "neighbor_id": ids,
                            "adist_micro": col,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = _min_parallel(vectors.select(id_col, vec_col)).mapInPandas(
        _score, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adist_micro", "rank")
    )


def pq_top_k_reranked(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 3,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
) -> DataFrame:
    """Two-stage PQ search, the shape production ANN systems run
    (IVF-PQ + re-rank): an ADC pass over the compressed codes shortlists
    ``shortlist`` candidates per query (:func:`pq_top_k` — integer LUT
    sums, deterministic ``(adist, id)`` cut), then ONLY the shortlist is
    re-scored against the full-precision vectors and the final top-k is
    exact cosine over those candidates.  Returns ``(query_id,
    neighbor_id, score, rank)`` — drop-in for :func:`brute_force_top_k`,
    with recall governed by the shortlist size (measured 0.87 @ 50 on
    the sf0.01 corpus with 8x16 codebooks, tests/test_pq.py).

    Scale shape: stage 1 touches full vectors once per partition and
    ships only O(parts · Q · shortlist) integer rows; stage 2 joins the
    tiny candidate set back to the corpus by id — the full-precision
    vectors never shuffle, never pair-blow-up.  At billion scale stage 1
    reads pre-encoded codes and this becomes a pure compressed-domain
    scan plus a ``Q · shortlist``-row gather."""
    cand = pq_top_k(
        vectors,
        queries,
        codebooks,
        k=shortlist,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        exclude_self=exclude_self,
    ).select("query_id", "neighbor_id")
    return _exact_rerank(
        cand, vectors, queries, k, id_col, vec_col, query_id_col
    )


def _exact_rerank(
    cand: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Full-precision cosine top-k over a shortlist: join the (tiny)
    ``(query_id, neighbor_id)`` candidate set back to the corpus by id,
    broadcast the query vectors, score with the strict-sequential fold,
    rank descending with the id tiebreak.  The corpus vectors never
    shuffle — only the shortlist gathers them."""
    _cosine = cosine_pandas_udf()
    qv = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    nv = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vv")
    )
    scored = (
        cand.join(nv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("_qv"), F.col("_vv")).alias("score"),
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


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codes: ``(id, sub, code)`` — each subvector's
    nearest codebook centroid (numpy argmin, first-index ties; the oracle
    replays the identical argmin as ``ORDER BY d, i``).  With
    ``m_sub=8, k=16`` a 64-dim float64 vector compresses 128x to 8
    4-bit codes; asymmetric distances then need only the ``m_sub × k``
    query-to-centroid table per query.  One Arrow-batched matmul per
    subspace over the corpus — map-only, no shuffle; the codebook rides
    the UDF closure exactly like the IVF centroids."""
    from pyspark.sql.pandas.functions import pandas_udf

    m_sub, _, ds = codebooks.shape

    @pandas_udf("array<int>")
    def _codes(col: pd.Series) -> pd.Series:
        V = np.vstack(col.to_numpy()).astype(np.float64)
        out = np.empty((len(V), m_sub), dtype=np.int32)
        for j in range(m_sub):
            out[:, j] = _sq_dists(
                V[:, j * ds : (j + 1) * ds], codebooks[j]
            ).argmin(axis=1)
        return pd.Series(list(out))

    return vectors.select(
        F.col(id_col),
        F.posexplode(_codes(F.col(vec_col))).alias("sub", "code"),
    )
