"""Phase-4 query inventory: duplicate clustering (connected components),
sequence packing, stratified sampling, and the analytics suite (rollup,
pivot, percentiles, interval join, moving averages, sketches).

Same registry + hash-parity conventions as queries.py: every computed
column aliased identically on both sides, float aggregates bridged through
exact decimals, deterministic tiebreaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.clusters import (
    connected_components,
    dedup_keep_canonical,
)
from cdc_data_lake_pyspark_spark.operators.dedup_text import (
    jaccard_similar_pairs_prefix,
    minhash_near_duplicates,
)
from cdc_data_lake_pyspark_spark.operators.packing import pack_documents
from cdc_data_lake_pyspark_spark.operators.sampling import stratified_sample
from cdc_data_lake_pyspark_spark.queries import _t, query
from cdc_data_lake_pyspark_spark.queries_phase3 import _HASH_SQL


def _hash_sql(expr: str) -> str:
    """The 60-bit portable md5 hash of an arbitrary VARCHAR expression,
    spelled in DuckDB (same math as relational.portable_id_hash)."""
    return (
        "list_reduce(list_transform(generate_series(1, 15), "
        f"i -> CAST(strpos('0123456789abcdef', substring(md5({expr}), i, 1)) - 1 AS BIGINT)), "
        "(a, c) -> a * 16 + c)"
    )

# ---------------------------------------------------------------------------
# Duplicate clustering — connected components over the exact-Jaccard pair
# graph, then canonical-member selection.  The DuckDB oracle resolves the
# same components with a recursive CTE (min reachable node per node).
# ---------------------------------------------------------------------------

# the exact 3-gram Jaccard pair CTEs (same construction as
# queries_phase2._JACCARD_ORACLE, threshold 0.8), left open for composition
_PAIR_CTES = """
toks AS (
  SELECT doc_id, list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(lower(text),' ')) - 2, 0)),
           i -> array_to_string(string_split(lower(text),' ')[i:i+2], ' '))) AS sh
  FROM documents
), ex AS (
  SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM toks
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         count(*) AS common, any_value(a.n) AS na, any_value(b.n) AS nb
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), close_pairs AS (
  SELECT a_id, b_id FROM pairs
  WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= 0.8
), edges AS (
  SELECT a_id AS src, b_id AS dst FROM close_pairs
  UNION
  SELECT b_id AS src, a_id AS dst FROM close_pairs
), reach(node, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
), comp AS (
  SELECT node, min(r) AS cluster_id FROM reach GROUP BY node
)
"""


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_PAIR_CTES}
    SELECT node AS doc_id, cluster_id FROM comp
    """,
)
def dedup_clusters(spark, sf_dir):
    """Near-duplicate clusters: exact-Jaccard pairs (≥ 0.8) folded into
    connected components via min-label propagation + pointer jumping —
    ``a~b, b~c ⇒ one cluster {{a,b,c}}``.  The oracle resolves the same
    graph with a recursive CTE; both sides emit cluster_id = min member.

    Pair source is the PREFIX-FILTERED exact join (VERDICT r9 #1):
    result-identical to the plain shingle self-join
    (tests/test_phase2.py::test_prefix_filtering_is_exact) but its join
    key frequency is bounded by rare-prefix membership, not raw document
    frequency — the plain join goes quadratic on a stop-shingle corpus
    at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_similar_pairs_prefix(docs, threshold=0.8).select(
        "a_id", "b_id"
    )
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


@query(
    "dedup_minhash_star_clusters",
    oracle=f"""
    WITH RECURSIVE {_PAIR_CTES}
    SELECT node AS doc_id, cluster_id FROM comp
    """,
)
def dedup_minhash_star_clusters(spark, sf_dir):
    """Near-duplicate clusters via the HOT-FAMILY-bounded LSH path:
    MinHash → size-capped banding (buckets over the cap emit only star
    edges against the bucket representative, so a duplicate family of n
    costs n−1 exact verifications instead of n²/2) → exact Jaccard
    verification → connected components.

    star_bucket_cap=2 forces the star path on every ≥3-member bucket of
    this corpus, yet the resulting components equal the exact-Jaccard
    clusters (the ``dedup_clusters`` oracle): each member's similarity to
    its family representative clears the threshold, which is exactly the
    regime the cap is designed for.  SCALE.md §8 measures the shuffle
    this bounds (minhash_lsh_salted_families' 40 GB verify traffic)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        docs, threshold=0.8, star_bucket_cap=2
    ).select("a_id", "b_id")
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


@query(
    "dedup_minhash_cv_clusters",
    oracle=f"""
    WITH RECURSIVE {_PAIR_CTES}
    SELECT node AS doc_id, cluster_id FROM comp
    """,
)
def dedup_minhash_cv_clusters(spark, sf_dir):
    """Near-duplicate clusters via CLUSTER-THEN-VERIFY (r7): MinHash →
    size-capped banding → spanning-forest reduction of the hot-bucket
    star edges (ONE exact verification per hot-bucket member, not one
    per band) → connected components over the UNVERIFIED candidate graph
    to scope provisional clusters → repair rounds that exactly verify
    the id-order boundary pairs between verified subclusters, re-linking
    near-threshold CHAINS the star path provably splits
    (tests/test_phase2.py::test_cv_recovers_chain_the_star_cap_splits).

    star_bucket_cap=2 forces the whole machinery on every ≥3-member
    bucket of this corpus; the components still equal the exact-Jaccard
    clusters (the ``dedup_clusters`` oracle).  At scale this bounds the
    salted-families verify traffic to ~#hot docs per round instead of
    bands × members (SCALE_MEASURED.json → scale100)."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        minhash_near_dup_clusters_cv,
    )

    docs = _t(spark, sf_dir, "documents")
    return minhash_near_dup_clusters_cv(
        docs, threshold=0.8, star_bucket_cap=2
    )


@query(
    "dedup_keep_canonical",
    oracle=f"""
    WITH RECURSIVE {_PAIR_CTES}
    SELECT d.doc_id, d.lang FROM documents d
    WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE node <> cluster_id)
    """,
)
def dedup_keep_canonical_q(spark, sf_dir):
    """The deduplicated corpus: per near-duplicate cluster keep only the
    minimum-id member; unpaired docs survive.  Anti-join of the corpus
    against the (small) drop set — broadcasts under AQE.

    Pair source is the prefix-filtered exact join (VERDICT r9 #1) —
    result-identical to the plain self-join, stop-shingle-safe at
    scale; see dedup_clusters."""
    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_similar_pairs_prefix(docs, threshold=0.8).select(
        "a_id", "b_id"
    )
    return dedup_keep_canonical(docs, pairs).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Sequence packing — token-budget bin assignment (greedy first-fit in id
# order within portable-hash groups).  The oracle replays the same greedy
# walk with a recursive CTE advancing one row per group per step.
# ---------------------------------------------------------------------------


@query(
    "pack_sequences",
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT doc_id,
             CAST({_HASH_SQL} % 16 AS INT) AS grp,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), seq AS (
      SELECT grp, doc_id, n_tokens,
             row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
      FROM base
    ), rec AS (
      SELECT grp, rn, doc_id, n_tokens,
             CAST(1 AS BIGINT) AS bin, n_tokens AS fill
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.grp, s.rn, s.doc_id, s.n_tokens,
             CASE WHEN r.fill + s.n_tokens <= 512
                  THEN r.bin ELSE r.bin + 1 END,
             CASE WHEN r.fill + s.n_tokens <= 512
                  THEN r.fill + s.n_tokens ELSE s.n_tokens END
      FROM rec r JOIN seq s ON s.grp = r.grp AND s.rn = r.rn + 1
    )
    SELECT grp AS "group", doc_id, n_tokens, bin FROM rec
    """,
)
def pack_sequences(spark, sf_dir):
    """Token-budget sequence packing (512-token bins, 16 independent
    hash groups): greedy first-fit in id order inside each group via ONE
    applyInPandas pass — the sequential decision stays per-group-linear
    while groups parallelize freely.  The oracle replays the identical
    greedy walk with a recursive CTE."""
    from cdc_data_lake_pyspark_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_documents(docs, budget=512, n_groups=16)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling — data-mixing rates per language.
# ---------------------------------------------------------------------------

_TICKET_SQL = _hash_sql("lang || '|' || CAST(doc_id AS VARCHAR)")


@query(
    "stratified_sample_docs",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang, {_TICKET_SQL} % 1000000 AS ticket FROM documents
    )
    WHERE ticket < CASE lang WHEN 'en' THEN 500000
                             WHEN 'zh' THEN 250000
                             ELSE 100000 END
    """,
)
def stratified_sample_docs(spark, sf_dir):
    """Deterministic data mixing: keep 50% of en, 25% of zh, 10% of the
    rest — the keep decision is a pure function of (stratum, id) via the
    portable hash, so the selected set is identical across engines, runs,
    and partitionings (what sample()/sampleBy() cannot promise).
    Map-only: no shuffle, filter pushes to the scan."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(
        docs, {"en": 0.5, "zh": 0.25}, default_fraction=0.1
    )


# ---------------------------------------------------------------------------
# Analytics suite — rollup, pivot, exact percentiles, interval join,
# moving averages.  Star-join dimensions broadcast; float aggregates ride
# the exact decimal bridge so both engines hash identically.
# ---------------------------------------------------------------------------


def _star(spark, sf_dir):
    """orders ⋈ customer ⋈ nation ⋈ region with dimensions broadcast —
    the shared star-join base (facts shuffle once on o_custkey; the
    dimension chain is build-side broadcast, no extra exchanges)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(
            F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
        )
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )


@query(
    "revenue_rollup",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def revenue_rollup(spark, sf_dir):
    """Hierarchical revenue rollup (region → nation → grand total) in ONE
    pass: Spark's ``rollup`` expands grouping sets inside a single
    aggregate (Expand + partial agg), not three scans.  Dimensions
    broadcast; the fact table shuffles once."""
    star = _star(spark, sf_dir)
    return (
        star.rollup(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


@query(
    "pivot_segment_region",
    oracle="""
    SELECT c.c_mktsegment AS segment,
    """
    + ",\n    ".join(
        "CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) "
        f"FILTER (WHERE r.r_name = '{reg}') AS DOUBLE) AS \"rev_{reg}\""
        for reg in _REGIONS
    )
    + """
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY c.c_mktsegment
    """,
)
def pivot_segment_region(spark, sf_dir):
    """Revenue pivot: market segment rows × region columns.  Explicit
    pivot values keep this a single aggregate (no extra distinct pass to
    discover columns — the scale trap of ``pivot()`` without values)."""
    star = _star(spark, sf_dir)
    pivoted = (
        star.groupBy(F.col("c_mktsegment").alias("segment"))
        .pivot("r_name", _REGIONS)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
    )
    return pivoted.select(
        "segment",
        *[F.col(f"`{reg}`").cast("double").alias(f"rev_{reg}") for reg in _REGIONS],
    )


@query(
    "segment_price_percentiles",
    oracle="""
    WITH ranked AS (
      SELECT c.c_mktsegment AS segment, o.o_totalprice AS price,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice, o.o_orderkey) AS rn,
             count(*) OVER (PARTITION BY c.c_mktsegment) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT segment,
           max(CASE WHEN rn = CAST(ceiling(0.25 * n) AS BIGINT) THEN price END) AS p25,
           max(CASE WHEN rn = CAST(ceiling(0.50 * n) AS BIGINT) THEN price END) AS p50,
           max(CASE WHEN rn = CAST(ceiling(0.75 * n) AS BIGINT) THEN price END) AS p75
    FROM ranked GROUP BY segment
    """,
)
def segment_price_percentiles(spark, sf_dir):
    """Exact per-group percentiles (p25/p50/p75 of order value per market
    segment) by deterministic rank selection — each percentile is an
    ACTUAL data value (discrete selection at ceil(p·n)), so the result is
    bit-identical across engines, unlike interpolating percentile_cont
    whose float arithmetic differs in the last ulp.  One shuffle + one
    per-group sort; the window and the final aggregate share the same
    partitioning."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(
        F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").alias("price"),
        "o_orderkey",
    )
    w = Window.partitionBy("segment").orderBy("price", "o_orderkey")
    ranked = joined.select(
        "segment",
        "price",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("segment")).alias("n"),
    )

    def pick(p: float):
        at = F.ceil(F.lit(p) * F.col("n")).cast("long")
        return F.max(F.when(F.col("rn") == at, F.col("price")))

    return ranked.groupBy("segment").agg(
        pick(0.25).alias("p25"), pick(0.50).alias("p50"), pick(0.75).alias("p75")
    )


@query(
    "purchase_attribution_window",
    oracle="""
    SELECT p.event_id, CAST(count(*) AS BIGINT) AS n_prior_events
    FROM events p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.ts <= p.ts
     AND e.ts > p.ts - INTERVAL 1 HOUR
     AND e.event_id <> p.event_id
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def purchase_attribution_window(spark, sf_dir):
    """Interval (range) join: for each purchase, the user's other events
    in the preceding hour — the attribution-window shape.  The EQUALITY
    key (user) drives the join, so this is an equi-join with residual
    range predicates, never a cross join: both sides shuffle once on the
    user key and the time window filters within matched groups.  At
    100 TB per-user groups stay small, so the residual filter never
    explodes; the purchase-side filter pushes to the scan."""
    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    purchases = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    cond = (
        (events["user_id"] == purchases["p_user"])
        & (events["ts"] <= purchases["p_ts"])
        & (events["ts"] > purchases["p_ts"] - F.expr("INTERVAL 1 HOUR"))
        & (events["event_id"] != purchases["p_id"])
    )
    return (
        purchases.join(events, cond)
        .groupBy(F.col("p_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_prior_events"))
    )


@query(
    "daily_revenue_ma7",
    oracle="""
    WITH daily AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
    )
    SELECT day, CAST(rev AS DOUBLE) AS revenue, n_orders,
           CAST(CAST(SUM(rev) OVER w AS DOUBLE)
                / CAST(count(*) OVER w AS DOUBLE) AS DOUBLE) AS ma7
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def daily_revenue_ma7(spark, sf_dir):
    """Daily revenue with a trailing 7-day moving average.  The window sum
    runs over EXACT decimals (order-independent), and the average is one
    double division of exact inputs — bit-identical across engines.  The
    unpartitioned window is fine here because the day-level frame is tiny
    (one row per day); at raw-event scale you aggregate to days first —
    exactly what this query does."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        F.col("rev").cast("double").alias("revenue"),
        "n_orders",
        (
            F.sum("rev").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        )
        .cast("double")
        .alias("ma7"),
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped classics (Q3 / Q10 analogues on the driver's schema) —
# the canonical fact-to-fact + broadcast-dimension plans.
# ---------------------------------------------------------------------------


@query(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                               * 100) AS BIGINT)) AS DOUBLE) / 100
             AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: top-10 not-yet-shipped orders by discounted
    revenue for one segment.  Both date filters and the segment filter
    push into the parquet scans; customer broadcasts onto orders, the
    orders→lineitem join shuffles on the order key (the co-partitioning a
    bucketed lakehouse table gets for free); the top-10 is
    TakeOrderedAndProject, never a full sort."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    customer = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    # round-to-cents BIGINT bridge: both engines compute the identical
    # double product, and round() is half-away-from-zero in both for
    # positive values — unlike the double->DECIMAL cast, whose tie rule
    # differs (Spark HALF_UP vs DuckDB half-even; bit at sf0.001)
    rev = (
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        ).cast("double")
        / 100
    )
    return (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                               * 100) AS BIGINT)) AS DOUBLE) / 100
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def returned_item_customers(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    items.  The returnflag filter pushes to the lineitem scan;
    customer/nation broadcast; one shuffle on the order key, one on the
    customer grouping; top-20 via TakeOrderedAndProject."""
    lineitem = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # round-to-cents BIGINT bridge: both engines compute the identical
    # double product, and round() is half-away-from-zero in both for
    # positive values — unlike the double->DECIMAL cast, whose tie rule
    # differs (Spark HALF_UP vs DuckDB half-even; bit at sf0.001)
    rev = (
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        ).cast("double")
        / 100
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(rev.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Sketches — portable HLL distinct counts (integer register state, oracle-
# verifiable) and embedding centroid state per label.
# ---------------------------------------------------------------------------

_HLL_HASH = _hash_sql("CAST(user_id AS VARCHAR)")


@query(
    "hll_distinct_users",
    oracle=f"""
    WITH h AS (
      SELECT event_type, {_HLL_HASH} AS hv FROM events
    ), r AS (
      SELECT event_type, hv % 256 AS j, hv // 256 AS w FROM h
    ), regs AS (
      SELECT event_type, j,
             max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS m_j
      FROM r GROUP BY event_type, j
    ), state AS (
      SELECT event_type,
             CAST(256 AS INT) AS m,
             CAST(256 - count(*) AS BIGINT) AS v_empty,
             CAST(SUM(1::BIGINT << (53 - m_j)) AS BIGINT) AS sum_pow
      FROM regs GROUP BY event_type
    ), exact AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT s.event_type, m, v_empty, sum_pow, n_exact
    FROM state s JOIN exact e ON s.event_type = e.event_type
    """,
)
def hll_distinct_users(spark, sf_dir):
    """Portable HyperLogLog distinct-user sketch per event type — the
    register STATE (not just the estimate) is exact integer arithmetic
    over the portable hash, so the oracle verifies the sketch itself and
    sketches built by any engine merge by register-max.  Two map-side-
    combined aggregations: 100 TB of events reduce to groups × 256 rows
    before the shuffle.  ``n_exact`` rides along for comparison (at scale
    you'd skip it — that's the point of the sketch)."""
    from cdc_data_lake_pyspark_spark.functions.sketch import hll_sketch

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    sk = hll_sketch(ev, "user_id", ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return sk.join(exact, "event_type")


# ---------------------------------------------------------------------------
# Incremental ingestion dedup: a NEW batch of documents against the
# fingerprint index of the already-ingested corpus — the continuous
# (day-over-day crawl) shape, where re-deduping the whole corpus per batch
# is the classic non-scalable mistake.
# ---------------------------------------------------------------------------


@query(
    "incremental_novel_docs",
    oracle="""
    WITH index_fps AS (
      SELECT DISTINCT md5(lower(trim(text))) AS fp FROM documents
      WHERE doc_id < 250
    ), batch AS (
      SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
      WHERE doc_id >= 250
    ), novel AS (
      SELECT doc_id, fp FROM batch
      WHERE fp NOT IN (SELECT fp FROM index_fps)
    )
    SELECT doc_id,
           CAST(CASE WHEN row_number()
                OVER (PARTITION BY fp ORDER BY doc_id) = 1
                THEN 1 ELSE 0 END AS INT) AS is_first_of_fp
    FROM novel
    """,
)
def incremental_novel_docs(spark, sf_dir):
    """Incremental exact dedup: the new batch (doc_id ≥ 250 stands in for
    today's crawl) anti-joins the ingested corpus's FINGERPRINT INDEX —
    32-byte digests, not documents — then self-dedups within the batch
    (first-per-fingerprint flag).  At 100 TB the index is a fraction of
    corpus size, the batch shuffles once on the digest, and the corpus is
    never rescanned; the index then grows by the novel fingerprints
    (union, not rebuild)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    index_fps = (
        docs.filter(F.col("doc_id") < 250).select(fp.alias("fp")).distinct()
    )
    batch = docs.filter(F.col("doc_id") >= 250).select("doc_id", fp.alias("fp"))
    novel = batch.join(index_fps, "fp", "left_anti")
    w = Window.partitionBy("fp").orderBy("doc_id")
    return novel.select(
        "doc_id",
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias("is_first_of_fp"),
    )


# ---------------------------------------------------------------------------
# Flagship composite: the whole prepare-training-data pipeline in ONE
# query — quality gate → exact dedup → near-dup canonical clustering →
# benchmark decontamination → deterministic split assignment.  Every stage
# is one of the engine's operators; the oracle replays the identical
# composition in SQL (recursive CTE for the clustering stage).
# ---------------------------------------------------------------------------


_PREPARE_CORPUS_ORACLE = f"""
    WITH RECURSIVE scored AS (
      SELECT doc_id, lang, text,
             0.5 * least(CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 64.0, 1.0)
           + 0.4 * (CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
                    / CAST(length(text) AS DOUBLE))
           + 0.1 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                    / CAST(length(text) AS DOUBLE)) AS quality,
             len(list_filter(string_split(lower(text), ' '),
                 x -> list_contains(['the','a','of','and','to','in','is'], x))) AS s_en
      FROM documents
    ), kept AS (
      SELECT doc_id, lang, text FROM scored WHERE quality >= 0.7 AND s_en > 0
    ), keepers AS (
      SELECT min(doc_id) AS keeper FROM kept GROUP BY md5(lower(trim(text)))
    ), base AS (
      SELECT k.doc_id, k.lang, k.text FROM kept k JOIN keepers g ON k.doc_id = g.keeper
    ), toks AS (
      SELECT doc_id, list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(lower(text),' ')) - 2, 0)),
               i -> array_to_string(string_split(lower(text),' ')[i:i+2], ' '))) AS sh
      FROM base
    ), ex AS (
      SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM toks
    ), pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             count(*) AS common, any_value(a.n) AS na, any_value(b.n) AS nb
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), close_pairs AS (
      SELECT a_id, b_id FROM pairs
      WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= 0.8
    ), edges AS (
      SELECT a_id AS src, b_id AS dst FROM close_pairs
      UNION
      SELECT b_id AS src, a_id AS dst FROM close_pairs
    ), reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
    ), comp AS (
      SELECT node, min(r) AS cluster_id FROM reach GROUP BY node
    ), canon AS (
      SELECT doc_id, lang, text FROM base
      WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> cluster_id)
    ), btoks AS (
      SELECT doc_id AS bench_id, list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(lower(text),' ')) - 7, 0)),
               i -> array_to_string(string_split(lower(text),' ')[i:i+7], ' '))) AS sh
      FROM documents WHERE doc_id % 20 = 0
    ), bex AS (
      SELECT bench_id, unnest(sh) AS s FROM btoks
    ), ctoks AS (
      SELECT doc_id, list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(lower(text),' ')) - 7, 0)),
               i -> array_to_string(string_split(lower(text),' ')[i:i+7], ' '))) AS sh
      FROM canon
    ), cex AS (
      SELECT doc_id, unnest(sh) AS s FROM ctoks
    ), contaminated AS (
      SELECT DISTINCT c.doc_id FROM cex c
      JOIN bex b ON c.s = b.s AND c.doc_id <> b.bench_id
    )
    SELECT doc_id, lang,
           CASE WHEN {_HASH_SQL} % 100 < 80 THEN 'train'
                WHEN {_HASH_SQL} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM canon
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    """


def _prepare_training_corpus(spark, sf_dir, near_dup_pairs, docs=None):
    """Shared body of the flagship composite: quality+language gate
    (map-only) → exact-dedup keeper selection (one fingerprint groupBy)
    → near-dup clustering at Jaccard ≥ 0.8 with canonical-member
    survival (connected components) → 8-shingle benchmark
    decontamination (anti-join) → deterministic 80/10/10 split (portable
    hash, map-only).  ``near_dup_pairs(base) -> (a_id, b_id, ...)``
    selects the near-dup discovery strategy; every strategy offered is
    result-identical on this corpus, so all variants share one oracle.
    ``docs`` overrides the corpus frame (must carry doc_id, lang, text)
    — the scale harness feeds the 100x replicated corpus through the
    IDENTICAL composition it oracles at sf0.01."""
    from cdc_data_lake_pyspark_spark.functions.text import (
        language_scores,
        quality_score,
    )
    from cdc_data_lake_pyspark_spark.operators.dedup_text import exact_dedup
    from cdc_data_lake_pyspark_spark.operators.relational import hash_split

    if docs is None:
        docs = _t(spark, sf_dir, "documents")
    scores = language_scores(F.col("text"))
    # the gated slice feeds THREE consumers (keeper election, the base
    # join, and through base the shingle pipelines) — stage it once so
    # the quality/language expression trees evaluate one time, not per
    # consumer (eager local checkpoint, the dedup_text staging pattern)
    kept = docs.select(
        "doc_id",
        "lang",
        "text",
        quality_score(F.col("text")).alias("quality"),
        scores["en"].alias("s_en"),
    ).filter(
        (F.col("quality") >= 0.7) & (F.col("s_en") > 0)
    ).localCheckpoint(eager=True)
    keepers = exact_dedup(kept).select("keeper_id")
    base = kept.join(
        F.broadcast(keepers), kept["doc_id"] == keepers["keeper_id"]
    ).select("doc_id", "lang", "text")

    near_pairs = near_dup_pairs(base).select("a_id", "b_id")
    canon = dedup_keep_canonical(base, near_pairs)

    bench = docs.filter(F.col("doc_id") % 20 == 0)
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        contamination_report,
    )

    contaminated = (
        contamination_report(canon, bench, k=8)
        .filter(F.col("doc_id") != F.col("bench_id"))
        .select("doc_id")
        .distinct()
    )
    clean = canon.join(contaminated, "doc_id", "left_anti")
    return hash_split(clean, id_col="doc_id").select("doc_id", "lang", "split")


@query("prepare_training_corpus", oracle=_PREPARE_CORPUS_ORACLE)
def prepare_training_corpus(spark, sf_dir):
    """The whole prepare-training-data pipeline in one lazily-planned
    DAG (see :func:`_prepare_training_corpus`).  The near-dup stage is
    the SSJoin/AllPairs prefix-filtered exact join — result-identical to
    the plain shingle self-join (tests/test_phase2.py::
    test_prefix_filtering_is_exact) but with candidates pruned to docs
    sharing a RARE-prefix shingle, so a 100 TB corpus where a stop
    shingle like "the end of" appears in every document cannot make the
    composite's near-dup stage quadratic."""
    return _prepare_training_corpus(
        spark,
        sf_dir,
        lambda base: jaccard_similar_pairs_prefix(base, threshold=0.8),
    )


@query("prepare_training_corpus_lsh", oracle=_PREPARE_CORPUS_ORACLE)
def prepare_training_corpus_lsh(spark, sf_dir):
    """LSH-mode flagship composite: identical pipeline, but the near-dup
    stage is MinHash → banded LSH (star-capped hot buckets, the default)
    → exact Jaccard verification of candidates only.  Oracle-shared with
    the exact variant because verification gives precision 1 and the
    seeded 64-hash/16×4 banding has recall 1 on this corpus (P[miss] <
    1e-7 per planted pair; equality asserted in tests/test_phase2.py::
    test_minhash_lsh_matches_exact_jaccard).  This is the variant to run
    when even the rare-prefix candidate space is too wide — cost scales
    with LSH bucket collisions, never with shingle document frequency."""
    return _prepare_training_corpus(
        spark,
        sf_dir,
        lambda base: minhash_near_duplicates(base, threshold=0.8),
    )


# ---------------------------------------------------------------------------
# PII scrubbing — the corpus carries no PII, so the query deterministically
# plants synthetic PII per row (same expression both sides) and scrubs it:
# every row exercises both replacements, and the full redacted text is
# hash-compared, proving regex parity on real document content too.
# ---------------------------------------------------------------------------


@query(
    "scrub_pii_docs",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               text || ' contact: u' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com or 555-123-4567.',
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(
               text || ' contact: u' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com or 555-123-4567.',
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(
               text || ' contact: u' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com or 555-123-4567.',
               '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')) AS INT) AS n_phones
    FROM documents
    """,
)
def scrub_pii_docs(spark, sf_dir):
    """PII scrubbing: plant a synthetic email+phone per row (the corpus
    has none), then redact with typed placeholders and count matches.
    Patterns stay within plain character classes so Java regex and RE2
    agree; map-only, no shuffle."""
    from cdc_data_lake_pyspark_spark.functions.text import pii_counts, scrub_pii

    docs = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact: u"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 555-123-4567."),
    )
    counts = pii_counts(planted)
    return docs.select(
        "doc_id",
        scrub_pii(planted).alias("redacted"),
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# Decontamination + repetition quality gates.
# ---------------------------------------------------------------------------


@query(
    "contamination_report",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, list_distinct(list_transform(
             generate_series(1, greatest(len(string_split(lower(text),' ')) - 7, 0)),
             i -> array_to_string(string_split(lower(text),' ')[i:i+7], ' '))) AS sh
      FROM documents
    ), cex AS (
      SELECT doc_id, unnest(sh) AS s FROM corpus
    ), bex AS (
      SELECT doc_id AS bench_id, unnest(sh) AS s FROM corpus WHERE doc_id % 20 = 0
    )
    SELECT c.doc_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM cex c JOIN bex b ON c.s = b.s
    WHERE c.doc_id <> b.bench_id
    GROUP BY c.doc_id, b.bench_id
    """,
)
def contamination_report_q(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing any 8-token shingle
    with a (here: deterministic every-20th-doc) benchmark set.  The
    corpus shuffles by shingle ONCE; the small benchmark side joins in
    (broadcast at real scale).  Long shingles make incidental collisions
    rare, so the join output tracks true overlaps."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        contamination_report,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    return contamination_report(docs, bench, k=8).filter(
        F.col("doc_id") != F.col("bench_id")
    )


@query(
    "doc_repetition_ratio",
    oracle="""
    WITH ex AS (
      SELECT doc_id, unnest(string_split(lower(text),' ')) AS t FROM documents
    ), tf AS (
      SELECT doc_id, t, count(*) AS c FROM ex GROUP BY doc_id, t
    )
    SELECT doc_id, CAST(max(c) AS BIGINT) AS max_tf,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS DOUBLE)
             AS repetition_ratio
    FROM tf GROUP BY doc_id
    """,
)
def doc_repetition_ratio(spark, sf_dir):
    """Repetition/boilerplate scoring: each doc's most-frequent-token
    share — degenerate repetitive documents score near 1.  Two map-side-
    combined aggregates sharing the (doc, token) partitioning; one double
    division of exact integers keeps the ratio hash-stable."""
    from cdc_data_lake_pyspark_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    tf = ex.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    return tf.groupBy("doc_id").agg(
        F.max("c").alias("max_tf"),
        F.sum("c").alias("n_tokens"),
        (
            F.max("c").cast("double") / F.sum("c").cast("double")
        ).alias("repetition_ratio"),
    )


@query(
    "chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), s AS (
      SELECT doc_id, toks, n, i AS start
      FROM t, LATERAL unnest(generate_series(0, greatest(n - 1, 0), 48)) AS g(i)
    )
    SELECT doc_id,
           CAST(start // 48 AS BIGINT) AS chunk_id,
           array_to_string(toks[start + 1 : start + 64], ' ') AS chunk_text,
           CAST(least(64, n - start) AS BIGINT) AS chunk_tokens
    FROM s
    """,
)
def chunk_documents_q(spark, sf_dir):
    """Context-window chunking (window 64, stride 48): every token lands
    in ≥1 chunk, consecutive chunks overlap 16 tokens, the tail chunk is
    short — the training-sequence splitting step.  Pure narrow-map
    expressions, no shuffle, no UDF (operators/chunking.py)."""
    from cdc_data_lake_pyspark_spark.operators.chunking import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"), window=64, stride=48)


@query(
    "repetition_gates",
    oracle="""
    WITH toksrc AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w,
             len(string_split(lower(text), ' ')) AS n
      FROM documents
    ), bg AS (
      SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
      FROM toksrc, LATERAL unnest(generate_series(1, n - 1)) AS t(i)
      WHERE n >= 2
    ), bgc AS (
      SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
    ), bstat AS (
      SELECT doc_id,
             CAST(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS DOUBLE)
               AS top_bigram_share,
             CAST(sum(c) AS BIGINT) AS n_bigrams
      FROM bgc GROUP BY doc_id
    ), tg AS (
      SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
      FROM toksrc, LATERAL unnest(generate_series(1, n - 2)) AS t(i)
      WHERE n >= 3
    ), tgc AS (
      SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g
    ), tstat AS (
      SELECT doc_id,
             CAST(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
                  / CAST(sum(c) AS DOUBLE) AS DOUBLE) AS dup_trigram_fraction,
             CAST(sum(c) AS BIGINT) AS n_trigrams
      FROM tgc GROUP BY doc_id
    )
    SELECT b.doc_id, b.top_bigram_share, b.n_bigrams,
           t.dup_trigram_fraction, t.n_trigrams
    FROM bstat b JOIN tstat t ON b.doc_id = t.doc_id
    """,
)
def repetition_gates(spark, sf_dir):
    """Gopher-style n-gram repetition gates (Rae et al. 2021 §A1.1, the
    public filtering heuristics): per document, the most-frequent-bigram
    share and the fraction of trigram occurrences whose trigram repeats
    within the doc — boilerplate and degenerate repetition score high on
    both.  Complements ``doc_repetition_ratio`` (unigram share).  Docs
    too short for a trigram are excluded (inner join), matching the
    oracle.  Scale: two explode → count aggregates sharing the
    (doc, gram) partitioning, map-side combined; ratios are one double
    division of exact integers (hash-stable)."""
    from cdc_data_lake_pyspark_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    base = docs.select("doc_id", w.alias("_w"), F.size(w).alias("_n"))

    def grams(min_n: int, size: int):
        return (
            base.filter(F.col("_n") >= min_n)
            .select(
                "doc_id",
                "_w",
                F.explode(
                    F.sequence(F.lit(1), F.col("_n") - (min_n - 1))
                ).alias("_i"),
            )
            .select(
                "doc_id",
                F.array_join(F.slice("_w", F.col("_i"), size), " ").alias("g"),
            )
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    bstat = grams(2, 2).groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
            "top_bigram_share"
        ),
        F.sum("c").alias("n_bigrams"),
    )
    tstat = grams(3, 3).groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("double")
            / F.sum("c").cast("double")
        ).alias("dup_trigram_fraction"),
        F.sum("c").alias("n_trigrams"),
    )
    return bstat.join(tstat, "doc_id")


_CMS_ROWS = "\n      UNION ALL\n      ".join(
    f"SELECT {i} AS hash_row, "
    + _hash_sql(f"'{i}|' || CAST(user_id AS VARCHAR)")
    + " % 256 AS bucket FROM events"
    for i in range(4)
)


@query(
    "cms_user_counts",
    oracle=f"""
    WITH ex AS (
      {_CMS_ROWS}
    )
    SELECT CAST(hash_row AS INT) AS hash_row, bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM ex GROUP BY hash_row, bucket
    """,
)
def cms_user_counts(spark, sf_dir):
    """Count-min sketch of per-user event counts: 4 × 256 integer
    counters over the row-salted portable hash — the heavy-hitter /
    frequency-estimate sketch, state verified cell-for-cell by the
    oracle.  Sketches from different partitions or engines merge by
    element-wise sum; 100 TB of events reduce to 1024 rows."""
    from cdc_data_lake_pyspark_spark.functions.sketch import cms_sketch

    ev = _t(spark, sf_dir, "events").select("user_id")
    return cms_sketch(ev, "user_id")


@query(
    "embedding_normalize",
    oracle="""
    WITH d AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x),
                              (a, b) -> a + b)) AS nrm
      FROM d
    )
    SELECT vec_id,
           CAST(generate_subscripts(v, 1) - 1 AS INT) AS dim,
           unnest(v) / nrm AS u
    FROM n
    """,
)
def embedding_normalize(spark, sf_dir):
    """Unit-normalize embeddings (the pre-step every cosine pipeline
    needs): L2 norm via an in-order left fold (both engines sum x² in
    array order, so the double math is bit-identical), then one division
    per element.  Map-only, no shuffle; emitted posexploded so the hash
    compares every component."""
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return emb.select(
        "vec_id", F.posexplode(v).alias("dim", "_x"), nrm.alias("_n")
    ).select("vec_id", "dim", (F.col("_x") / F.col("_n")).alias("u"))


@query(
    "embedding_centroids",
    oracle="""
    WITH ex AS (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             unnest(embedding) AS v
      FROM embeddings
    )
    SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(CAST(v AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT)
             AS sum_scaled,
           CAST(CAST(SUM(CAST(round(CAST(v AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
                / CAST(count(*) AS DOUBLE) AS DOUBLE) AS mean_scaled
    FROM ex GROUP BY label, dim
    """,
)
def embedding_centroids(spark, sf_dir):
    """Per-label embedding centroid state: each dimension's exact integer
    micro-unit sum (floats quantized to 1e-6 BEFORE aggregation, so the
    sum is order-independent) plus the mean as one double division.
    posexplode keeps everything JVM-side; the shuffle key (label, dim)
    spreads a 100 TB corpus over labels × dims reducers with map-side
    partial sums."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    return (
        ex.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("v").cast("double") * F.lit(1e6)).cast("long")
            ).alias("sum_scaled"),
        )
        .select(
            "label",
            "dim",
            "n",
            "sum_scaled",
            (
                F.col("sum_scaled").cast("double") / F.col("n").cast("double")
            ).alias("mean_scaled"),
        )
    )


# ---------------------------------------------------------------------------
# Skew utilities — oracled for completeness (registered OUTSIDE the gate
# window via queries._DEMOTED: their whole contract is equality with the
# plain operation the oracle states, also pytest-asserted in test_skew.py)
# ---------------------------------------------------------------------------


@query(
    "skew_salted_join",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def skew_salted_join(spark, sf_dir):
    """Deterministically salted join (hot keys spread over 8 salts, build
    side replicated 8x) — result must equal the plain inner join, which is
    exactly what the oracle computes."""
    from cdc_data_lake_pyspark_spark.operators.skew import salted_join

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return salted_join(orders, customer, ["o_custkey"], n_salts=8)


@query(
    "skew_salted_agg",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def skew_salted_agg(spark, sf_dir):
    """Two-phase salted count (partial per-salt collapse, then final sum)
    — result must equal the plain groupBy count."""
    from cdc_data_lake_pyspark_spark.operators.skew import salted_count_by_key

    ev = _t(spark, sf_dir, "events").select("event_type")
    return salted_count_by_key(ev, ["event_type"], n_salts=8)


@query(
    "dedup_substring_windows",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), win AS (
      SELECT doc_id, s - 1 AS s,
             md5(array_to_string(list_slice(toks, s, s + 7), ' ')) AS fp
      FROM base, LATERAL unnest(generate_series(1, n - 7)) AS g(s)
      WHERE n >= 8
    ), marked AS (
      SELECT doc_id, s,
             count(*) OVER (PARTITION BY fp) AS cnt,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id, s) AS rn
      FROM win
    ), dropped AS (
      SELECT DISTINCT m.doc_id, m.s + d.i AS p
      FROM marked m, LATERAL unnest(generate_series(0, 7)) AS d(i)
      WHERE m.cnt > 1 AND m.rn > 1
    ), toks AS (
      SELECT doc_id, CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS p,
             unnest(toks) AS tok, n
      FROM base
    ), survived AS (
      SELECT t.doc_id, t.p, t.tok
      FROM toks t LEFT JOIN dropped d
        ON t.doc_id = d.doc_id AND t.p = d.p
      WHERE d.p IS NULL
    ), rebuilt AS (
      SELECT doc_id,
             string_agg(tok, ' ' ORDER BY p) AS clean_text,
             count(*) AS kept
      FROM survived GROUP BY doc_id
    )
    SELECT b.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           CAST(b.n AS INT) AS n_tokens,
           CAST(b.n - coalesce(r.kept, 0) AS BIGINT) AS n_dropped
    FROM base b LEFT JOIN rebuilt r ON b.doc_id = r.doc_id
    """,
)
def dedup_substring_windows(spark, sf_dir):
    """Exact-substring window dedup (ExactSubstr, Lee et al. 2022): every
    duplicated 8-token span is removed from all but its first occurrence
    and documents are reassembled — portable md5 fingerprints make the
    whole editor value-checkable against DuckDB."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        substring_window_dedup,
    )

    return substring_window_dedup(_t(spark, sf_dir, "documents"), k=8)


_ORDER_HASH = _hash_sql("'epoch-0|' || CAST(doc_id AS VARCHAR)")


@query(
    "training_order_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source, {_ORDER_HASH} AS hh FROM documents
    )
    SELECT doc_id, source,
           CAST(hh % 8 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY hh % 8
                                   ORDER BY hh, doc_id) AS BIGINT) AS pos
    FROM h
    """,
)
def training_order_shards(spark, sf_dir):
    """Deterministic epoch ordering (`operators/sampling.py::
    training_order`): every doc gets a ``(shard, pos)`` such that
    reading shards in pos order replays one seeded global shuffle —
    reproducible across engines/runs/layouts (unlike ``rand()`` orders),
    source-interleaved in expectation because the order key is a
    uniform hash.  The oracle replays key, shard and within-shard rank
    exactly, so every position is value-checked.

    Plan: map-only key+shard, one exchange on shard + per-shard local
    sort (= the write-time repartition+sortWithinPartitions layout of a
    training export); no global sort at any corpus size."""
    from cdc_data_lake_pyspark_spark.operators.sampling import training_order

    docs = _t(spark, sf_dir, "documents")
    return training_order(docs, keep_cols=("source",))
