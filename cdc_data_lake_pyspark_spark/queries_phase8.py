"""Phase-8 inventory: multi-dimensional OLAP aggregation and bounded
graph reachability.

Two operator families the warehouse surface still lacked after phase 7:

* CUBE / ROLLUP grouping sets — the multi-dimensional subtotal lattice
  every BI layer sits on.  Spark's ``cube()`` plans ONE Expand node that
  replicates each input row once per grouping set inside whole-stage
  codegen, then a single map-side-combined aggregate — one shuffle for
  the whole lattice, not one scan per grouping set (the naive UNION ALL
  encoding would rescan the fact table 2^d times).
* bounded BFS reachability (graph.py::bfs_distances) — multi-source
  shortest hop distance by frontier expansion; the seed-set-propagation
  shape (distance-from-trusted-nodes quality priors, bounded blast-radius
  queries) and the second iterative-graph family next to PageRank.

Both exact-oracle-checked: grouping ids and subtotal counts are
integers, revenue rides the DECIMAL(18,2) exact-sum bridge, and BFS
distances are settled-set integers replayed by a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.graph import (
    bfs_distances,
    bfs_oracle_sql,
)
from cdc_data_lake_pyspark_spark.queries import _t, query
from cdc_data_lake_pyspark_spark.queries_phase7 import _COPURCHASE_EDGES_SQL


@query(
    "revenue_cube",
    oracle="""
    SELECT CAST(grouping(n_name, c_mktsegment) AS INT) AS gid,
           n_name, c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY CUBE(n_name, c_mktsegment)
    """,
)
def revenue_cube(spark, sf_dir):
    """Revenue across the full (nation × segment) CUBE lattice: every
    combination plus per-nation, per-segment, and grand-total subtotals,
    each tagged with its ``grouping_id`` bitmask (bit set = dimension
    rolled away — Spark and DuckDB agree on the encoding).

    Plan shape: the two dimension joins broadcast, then ONE Expand node
    replicates each fact row across the 4 grouping sets inside codegen
    and a single partial+final aggregate reduces them — one fact scan
    and one shuffle for the whole lattice.  At 100 TB this is the only
    viable encoding: the UNION-of-GROUP-BYs alternative scans the fact
    table once per grouping set.  Revenue is exact (DECIMAL(18,2) sums,
    order-independent) and cast to double only at the edge."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .cube("n_name", "c_mktsegment")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .select("gid", "n_name", "c_mktsegment", "n_orders", "revenue")
    )


@query(
    "bfs_part_distances",
    oracle=bfs_oracle_sql(
        _COPURCHASE_EDGES_SQL, seed_pred="node % 13 = 0", max_hops=4
    ),
)
def bfs_part_distances(spark, sf_dir):
    """Bounded multi-source BFS over the part co-purchase graph: every
    part within 4 hops of the seed set (part keys divisible by 13),
    labeled with its exact hop distance to the nearest seed.

    Per hop: one join of the NEWEST frontier layer against the staged
    edge list plus one anti-join against the settled set — work scales
    with frontier out-degree, never with path count, and the recursive
    -CTE oracle replays the same minimum by UNION-dedup + min(dist)."""
    from cdc_data_lake_pyspark_spark.operators.mining import frequent_pairs

    li = _t(spark, sf_dir, "lineitem")
    und = frequent_pairs(
        li, basket_col="l_orderkey", item_col="l_partkey", min_support=2
    ).select("item_a", "item_b")
    edges = und.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionAll(
        und.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(F.col("node") % 13 == 0)
    return bfs_distances(edges, seeds, max_hops=4)
