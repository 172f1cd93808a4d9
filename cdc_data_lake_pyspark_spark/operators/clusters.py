"""Duplicate clustering: connected components over a near-duplicate pair
graph, and canonical-document selection per cluster.

Pair generators (exact Jaccard, MinHash-LSH, SimHash, embedding-cosine —
operators/dedup_text.py, operators/similarity.py) emit *pairs*; an actual
corpus dedup needs pairs folded into *clusters* (a ~ b, b ~ c ⇒ keep one of
{a, b, c}).  That fold is connected components.

Scale design — iterative min-label propagation with pointer jumping:

* state per iteration is one narrow ``(node, label)`` frame — two BIGINTs
  per distinct doc in the pair graph, orders of magnitude smaller than the
  corpus (only docs that appear in a pair are nodes);
* each iteration is ONE shuffle to propagate the min label across edges and
  ONE self-join to compress label chains (pointer jumping), giving
  O(log diameter) convergence — a 1M-doc chain needs ~20 rounds, and real
  near-dup clusters (dense, clique-ish) converge in 2-3;
* ``localCheckpoint`` after every iteration truncates the lineage so the
  plan does not grow with the iteration count (the classic iterative-Spark
  failure mode);
* convergence is detected with a count of changed labels — an aggregate,
  not a collect; the driver sees one number per round.

This is the standard formulation (cf. the CC-MR / large-star-small-star
family, Kiveris et al., "Connected Components in MapReduce and Beyond");
label propagation + pointer jumping is the variant that maps cleanly onto
DataFrame joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric_edges(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Undirected edge list ``(src, dst)`` — each input pair in both
    directions, deduplicated."""
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    return fwd.unionByName(rev).distinct()


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iterations: int = 25,
) -> DataFrame:
    """Resolve an undirected pair graph into components.

    Returns ``(node, cluster_id)`` — one row per distinct node, where
    ``cluster_id`` is the MINIMUM node id in the component (deterministic,
    layout-independent).  Nodes not mentioned in any pair are absent (a
    caller treats missing docs as singleton clusters of themselves).

    ``max_iterations`` bounds the driver loop; with pointer jumping the
    label frame converges in O(log diameter) rounds, so 25 covers graphs
    with diameters up to ~2^25.  Raises if the bound is hit without
    convergence (never silently returns partial clusters).
    """
    edges = _symmetric_edges(pairs, a_col, b_col).localCheckpoint(eager=True)
    # Initial labels already carry the FIRST propagation: label(v) =
    # min(v, min(neighbors)) falls out of one aggregate over the edge
    # list (the distinct-node init plus round 1's propagate collapsed
    # into a single shuffle) — dense clique-ish duplicate clusters, the
    # common near-dup shape, then converge on the immediately following
    # verification round.
    labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.least(F.min("src"), F.min("dst")).alias("label"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # Propagate: each node also sees every neighbor's current label;
        # take the min.  One shuffle keyed by node.
        nbr = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        proposed = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # Pointer jumping: replace each label by ITS label, collapsing
        # chains (a→b, b→c becomes a→c) — this is what makes convergence
        # logarithmic instead of linear in the diameter.
        lookup = proposed.select(
            F.col("node").alias("_l"), F.col("label").alias("_ll")
        )
        # The changed-flag join rides INSIDE the eagerly checkpointed
        # frame, so the convergence count is a scan of the cached blocks
        # instead of a second join job per iteration.
        jumped = (
            proposed.join(lookup, proposed["label"] == lookup["_l"], "left")
            .join(
                labels.select("node", F.col("label").alias("_old")), "node"
            )
            .select(
                "node",
                F.coalesce("_ll", "label").alias("label"),
                (F.coalesce("_ll", "label") != F.col("_old")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter(F.col("_chg")).count()
        labels = jumped.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """The corpus after near-duplicate removal: for every duplicate
    cluster keep only the canonical (minimum-id) member; docs in no pair
    survive untouched.

    At convergence ``cluster_id`` IS the canonical member, so the drop set
    is simply ``node != cluster_id`` — an anti-join of the corpus against
    a frame no larger than the duplicate population.  Under AQE the drop
    set broadcasts whenever duplicates are rare (the common case), making
    this a map-side filter over the corpus.
    """
    cc = connected_components(pairs, a_col=a_col, b_col=b_col)
    drop = cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
