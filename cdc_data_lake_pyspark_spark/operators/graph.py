"""Iterative graph analytics: fixed-point PageRank over a distributed
edge list.

PageRank is THE canonical iterative distributed algorithm (Page et al.
1999; the Pregel/GraphX formulation); a training-data pipeline uses it to
rank hosts/documents in a link graph (Common-Crawl-style harmonic/rank
centrality quality signals) and a warehouse uses it on co-occurrence
graphs (co-purchase, co-citation).  Spark has no built-in PageRank on
DataFrames, so this is a pure DataFrame composition: one join + one
aggregation per iteration.

Determinism contract (what makes the oracle exact): all rank mass is
carried as INTEGER micro-units (1e12 = rank 1.0) and every per-iteration
operation is integer arithmetic — ``rank div out_degree`` per edge,
``sum(bigint)`` per destination (order-independent, unlike float sums),
``(damping * sum) div 100`` — so ANY engine that replays the same
schedule produces bit-identical ranks.  This is the same exact-integer
bridge the LM scorers use (lm_quality.py); floor-division mass loss is
deterministic and bounded by #edges ulps per iteration.

Scale: each iteration is ONE shuffle (the groupBy on dst) plus one join
of the current rank vector against the static edge list.  The edge list
is staged once behind an eager local checkpoint and reused by every
iteration; the rank vector is localCheckpoint'd per iteration so the
lineage (and the scheduler's DAG) stays O(1) instead of O(iterations).
On a real cluster you would additionally pre-partition edges by ``src``
(bucketed table) so the per-iteration join is exchange-free on the edge
side; rank vectors are #nodes rows — tiny next to edges.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 1.0 of rank mass, in integer micro-units (micro^2: 1e12 keeps six
#: significant digits after a million-node spread).
RANK_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 6,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    ``rank_micro`` is exact (integer fixed-point, see module docstring);
    ``rank`` is the same value as a double for human consumption.
    Dangling nodes (no out-edges) appear in the output with ranks fed by
    their in-edges, but their own mass is dropped each iteration (the
    standard simplification; deterministic).  ``damping_pct`` is the
    damping factor in percent so the teleport term stays integer.

    Every iteration: contribution = ``rank_micro div out_degree`` per
    out-edge, summed per destination (one shuffle), then
    ``teleport + damping * sum div 100``.  Nodes receiving no mass get
    the bare teleport term via a left join on the node set.
    """
    e = (
        edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionAll(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # single-row node count, cross-joined so N is available without a
    # driver-side collect (keeps the whole plan lazy / replayable)
    n_frame = nodes.agg(F.count(F.lit(1)).alias("_n"))
    deg = e.groupBy(F.col("_src").alias("node")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    # out-degree rides ON the staged edge list, so each iteration joins
    # the rank vector against ONE frame instead of deg-then-edges;
    # ``rank div deg`` per edge row equals the per-node share fanned out
    # (same integer operands), so the schedule — and the unrolled SQL
    # oracle — is unchanged
    e_deg = (
        e.join(deg, e._src == deg.node)
        .select("_src", "_dst", "_deg")
        .localCheckpoint(eager=True)
    )

    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node",
        F.expr(f"CAST({RANK_SCALE} AS BIGINT) div _n").alias("rank_micro"),
        "_n",
    )
    teleport = F.expr(f"CAST({100 - damping_pct} * {RANK_SCALE} AS BIGINT) div (100 * _n)")
    for _ in range(iterations):
        contrib = (
            ranks.join(e_deg, ranks.node == e_deg._src)
            .select(
                F.col("_dst"), F.expr("rank_micro div _deg").alias("_share")
            )
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum("_share").alias("_in"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_frame))
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    teleport
                    + F.expr(
                        f"({damping_pct} * coalesce(_in, CAST(0 AS BIGINT))) div 100"
                    )
                ).alias("rank_micro"),
                "_n",
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "node",
        "rank_micro",
        (F.col("rank_micro").cast("double") / F.lit(float(RANK_SCALE))).alias(
            "rank"
        ),
    )


def pagerank_oracle_sql(
    edges_cte: str,
    iterations: int = 6,
    damping_pct: int = 85,
) -> str:
    """Build the ANSI-SQL replay of :func:`pagerank` by unrolling the
    fixed iteration count into chained CTEs (recursive CTEs can't
    re-aggregate per step, so unrolling is the portable encoding).

    ``edges_cte`` must be a SELECT producing columns ``src, dst``.  The
    integer fixed-point schedule matches :func:`pagerank` operation for
    operation, so the replay is bit-exact in any engine with 64-bit
    integer division (`//` below is DuckDB integer division).
    """
    parts = [
        f"WITH edges AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges"
        " UNION ALL SELECT dst FROM edges))",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d"
        " FROM edges GROUP BY 1)",
        f"r0 AS (SELECT node, CAST({RANK_SCALE} AS BIGINT) // n AS r"
        " FROM nodes, nn)",
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, CAST(sum(p.r // g.d) AS BIGINT) AS m"
            f" FROM {prev} p JOIN deg g USING (node)"
            " JOIN edges e ON e.src = p.node GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS (SELECT n0.node,"
            f" CAST({100 - damping_pct} * {RANK_SCALE} AS BIGINT) // (100 * nn.n)"
            f" + ({damping_pct} * COALESCE(c.m, CAST(0 AS BIGINT))) // 100 AS r"
            f" FROM nodes n0 CROSS JOIN nn LEFT JOIN c{i} c USING (node))"
        )
        prev = f"r{i}"
    parts.append(
        f"SELECT node, r AS rank_micro,"
        f" CAST(r AS DOUBLE) / {float(RANK_SCALE)} AS rank FROM {prev}"
    )
    return ",\n".join(parts[:1] + parts[1:-1]) + "\n" + parts[-1]


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 4,
    seed_col: Optional[str] = None,
) -> DataFrame:
    """Multi-source breadth-first shortest hop distance over a directed
    edge list: every node reachable from ``sources`` within ``max_hops``
    hops, labeled with its distance to the NEAREST source (0 for the
    sources themselves).

    This is the trust/label-propagation shape a corpus pipeline uses to
    expand a seed set over a link graph (e.g. distance-from-trusted-hosts
    as a quality prior) and a warehouse uses for bounded reachability.
    Spark has no DataFrame BFS, so this is the textbook frontier loop:
    per hop, join ONLY the newest layer against the static edge list
    (one shuffle), anti-join out already-settled nodes, settle the rest
    at distance ``k``.  A node is settled the first time it is reached,
    so distances are exact BFS minima by construction — no re-visits, no
    min-aggregation over paths, and the per-hop work is proportional to
    the frontier's out-degree sum, never to the number of paths.

    Determinism contract: distances are small exact integers; set
    membership is the only state.  The oracle replay is a recursive CTE
    (UNION-deduped ``(node, dist)`` pairs bounded by ``max_hops`` per
    node) reduced by ``min(dist)`` — a different but provably equivalent
    encoding of the same BFS minimum (:func:`bfs_oracle_sql`).

    Scale: the edge list stages once behind an eager local checkpoint and
    is reused every hop; settled/frontier vectors are node-sized (tiny
    next to edges) and localCheckpoint'd per hop so lineage stays O(1)
    in hop count.  On a real cluster, pre-bucket edges by ``src`` to
    make the per-hop join exchange-free on the edge side.
    """
    e = (
        edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
        .localCheckpoint(eager=True)
    )
    # Seeds: an explicit column (seed_col) rather than a silent positional
    # pick, restricted to the graph's node inventory so a caller passing
    # out-of-graph seeds agrees with the oracle (which can only seed from
    # nodes in the edge list) by construction.
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionAll(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    seed_name = seed_col if seed_col is not None else sources.columns[0]
    settled = (
        sources.select(F.col(seed_name).alias("node"))
        .distinct()
        .join(nodes, "node", "left_semi")
        .select("node", F.lit(0).cast("int").alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = settled
    for hop in range(1, max_hops + 1):
        reached = (
            frontier.join(e, frontier.node == e._src)
            .select(F.col("_dst").alias("node"))
            .distinct()
        )
        fresh = (
            reached.join(settled.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).cast("int").alias("dist"))
            .localCheckpoint(eager=True)
        )
        # settled stays a LAZY union of the per-hop checkpoints (r16):
        # every term is already materialized, so consumers just read the
        # accumulated blocks — re-checkpointing the union each hop paid
        # one extra O(settled)-sized job per hop for a plan that is only
        # max_hops unions deep anyway
        settled = settled.unionAll(fresh)
        frontier = fresh
    return settled


def bfs_oracle_sql(
    edges_cte: str,
    seed_pred: str,
    max_hops: int = 4,
) -> str:
    """ANSI-SQL replay of :func:`bfs_distances` as a recursive CTE.

    ``edges_cte`` must produce columns ``src, dst``; ``seed_pred`` is a
    boolean expression over ``node`` selecting the source set from the
    graph's node inventory.  The recursive walk explores UNION-deduped
    ``(node, dist)`` pairs (each node appears at most ``max_hops + 1``
    times, so the walk is bounded even on cyclic graphs) and the final
    ``min(dist)`` per node is exactly the first-reach distance the
    frontier loop settles.

    The RECURSIVE CTE sits in a subquery below a PLAIN outer WITH:
    ``edges_cte`` may itself open a nested WITH (the co-purchase chain
    does), and ``WITH RECURSIVE`` changes the scoping of nested CTE
    lists in DuckDB — the subquery placement keeps both worlds intact.
    """
    return f"""
    WITH edges AS ({edges_cte}),
    all_nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
      )
    )
    SELECT node, CAST(min(d) AS INT) AS dist FROM (
      WITH RECURSIVE walk(node, d) AS (
        SELECT node, 0 FROM all_nodes WHERE {seed_pred}
        UNION
        SELECT e.dst, w.d + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.d < {max_hops}
      )
      SELECT * FROM walk
    ) GROUP BY node
    """
