"""Behavioral mining operators: event-transition matrices,
market-basket frequent pairs, and triangle enumeration.

Training-data / product-analytics additions beyond the reference's CDC
scope (SURVEY §2.6 extension surface).  Both are pure DataFrame
compositions (no UDFs, no collects) with exact ANSI-SQL oracles (registered in
queries_phase6.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event sequences:
    for every observed ``(from_state, to_state)`` pair of CONSECUTIVE
    events of one key, the transition count and row-normalized
    probability — the path-analysis aggregate behind "what do users do
    next" dashboards and sequence-model sanity checks.

    One window over ``(key, ts, tiebreak)`` — a single shuffle on the key
    (the partitioning sessionization and funnels already use) — then a
    map-side-combined count over at most |states|² groups; the
    probability divides two exact BIGINTs per row (one IEEE division, so
    results hash-match any engine).  Last events of a key (no successor)
    are excluded.  At 100 TB: the heavy stage is the per-key sort the
    window needs; the aggregate output is tiny by construction.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    steps = (
        events.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
    )
    counts = steps.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(totals).cast("double")
        ).alias("prob"),
    )

def frequent_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Market-basket frequent item pairs (the Apriori/FP-growth first
    lattice level): every unordered item pair co-occurring in at least
    ``min_support`` baskets, with its support count.

    Plan shape: distinct (basket, item) → prune items below
    ``min_support`` on their own (the Apriori monotonicity bound: a pair
    can never outnumber its rarer member — this is what keeps the
    self-join candidate set small on long-tail catalogs) → per-basket
    self-equi-join on the basket key with ``item_a < item_b`` → one
    map-side-combined count + support filter.

    The self-join is keyed on the basket id, so candidate volume is
    sum-over-baskets of (frequent items per basket)² — bounded by basket
    size, never catalog size; no cross join exists anywhere.  At 100 TB
    the one skew risk is a mega-basket (a basket with thousands of
    items); cap those upstream or salt the basket key — the operator's
    join shape is unchanged.

    The distinct+prune working set is staged behind an eager local
    checkpoint: it feeds THREE consumers (the singleton count and both
    self-join sides), and without staging each one would rescan and
    re-distinct the full fact table.
    """
    items = baskets.select(basket_col, item_col).distinct().localCheckpoint(
        eager=True
    )
    frequent = (
        items.groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("_s"))
        .filter(F.col("_s") >= min_support)
        .select(item_col)
    )
    pruned = items.join(frequent, item_col).localCheckpoint(eager=True)
    a = pruned.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("item_a")
    )
    b = pruned.select(
        F.col(basket_col).alias("_b2"), F.col(item_col).alias("item_b")
    )
    pairs = a.join(
        b, (a["_b"] == b["_b2"]) & (a["item_a"] < b["item_b"])
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )

def triangle_enumerate(
    edges: DataFrame, u_col: str = "item_a", v_col: str = "item_b"
) -> DataFrame:
    """Enumerate all triangles of an undirected graph given as unique
    undirected edges — graph-shaped quality analytics (community density,
    co-occurrence cliques) over e.g. the co-purchase graph that
    :func:`frequent_pairs` emits.

    The classic two-join MPC algorithm with DEGREE ORIENTATION: every
    edge is directed from its (degree, id)-smaller endpoint to the
    larger, so each vertex's out-degree is bounded by ~sqrt(2m) and the
    wedge join generates O(m^1.5) candidates worst-case (Suri & Vassilvitskii's
    bound) instead of O(m * d_max) — the hub-vertex explosion a raw
    id-orientation suffers on power-law graphs.  Wedges (a→b→c) join the
    directed edge set once more on the closing edge (a→c).

    Output: one row per triangle with its three vertex ids sorted
    ascending (``a < b < c``) — orientation-invariant, so any engine's
    enumeration hash-matches.  Three shuffles: degree count, the wedge
    join, the closing join; candidates never exceed the wedge bound.

    The edge set feeds FIVE consumers (two degree projections, the
    orientation join, both wedge sides via the directed set, the closing
    side) and the directed set three, so both stage behind eager local
    checkpoints — without them Spark would replicate the upstream edge
    derivation (e.g. the whole frequent-pairs pipeline) per consumer.
    """
    edges = edges.localCheckpoint(eager=True)
    deg = (
        edges.select(F.col(u_col).alias("_x"))
        .unionAll(edges.select(F.col(v_col).alias("_x")))
        .groupBy("_x")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    e = (
        edges.select(F.col(u_col).alias("_u"), F.col(v_col).alias("_v"))
        .join(deg.select(F.col("_x").alias("_u"), F.col("_d").alias("_du")), "_u")
        .join(deg.select(F.col("_x").alias("_v"), F.col("_d").alias("_dv")), "_v")
    )
    fwd = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("_u") < F.col("_v"))
    )
    directed = e.select(
        F.when(fwd, F.col("_u")).otherwise(F.col("_v")).alias("src"),
        F.when(fwd, F.col("_v")).otherwise(F.col("_u")).alias("dst"),
    ).localCheckpoint(eager=True)
    w1 = directed.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    w2 = directed.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = w1.join(w2, "b")
    closing = directed.select(
        F.col("src").alias("a"), F.col("dst").alias("c")
    )
    tri = wedges.join(closing, ["a", "c"])
    ids = F.array_sort(F.array("a", "b", "c"))
    return tri.select(
        ids[0].alias("v1"), ids[1].alias("v2"), ids[2].alias("v3")
    )
