"""Extended relational coverage: the classic-operator checklist rows not
exercised by plans/relational.py — correlated scalar subqueries (with
Catalyst decorrelation), EXISTS semi-joins, as-of joins, pivot, exact
percentiles. Each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hogflare_spark.plans import query
from hogflare_spark.sources.readers import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# correlated scalar subquery: customers above their nation's average
# balance. Written as literal correlated SQL so Catalyst's decorrelation
# rewrites it to an aggregate+join — the plan a hand-written groupBy+join
# would produce, proving the subquery path costs nothing at scale.
# --------------------------------------------------------------------------
def _correlated_sql(table: str) -> str:
    # the nation sum goes through DECIMAL so it is EXACT: float summation
    # order differs between engines (Spark partial-aggregates per
    # partition), and an inexact avg sitting on a .xx5 rounding edge or the
    # filter threshold would flip between engines. Exact sum -> identical
    # double -> identical division/filter everywhere. The display column
    # uses floor (bit-identical on identical doubles) because round()
    # half-edge behavior differs between Spark (BigDecimal HALF_UP on the
    # shortest decimal repr) and DuckDB (scaled std::round).
    return f"""
    SELECT c_custkey, c_acctbal,
           floor(nation_sum / nation_cnt * 100) / 100 AS nation_avg
    FROM (
      SELECT c_custkey, c_acctbal,
             CAST((SELECT sum(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                   FROM {table} c2
                   WHERE c2.c_nationkey = c.c_nationkey) AS DOUBLE) AS nation_sum,
             (SELECT count(*) FROM {table} c2
              WHERE c2.c_nationkey = c.c_nationkey) AS nation_cnt
      FROM {table} c
    )
    WHERE c_acctbal > nation_sum / nation_cnt * 1.5
    ORDER BY c_custkey
    """


@query("q_correlated_above_avg", oracle=_correlated_sql("customer"))
def q_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(_correlated_sql("v_customer"))


# --------------------------------------------------------------------------
# q4 shape: EXISTS semi-join — order-priority counts for orders with at
# least one line shipped after the order date. The EXISTS compiles to a
# left-semi hash join on o_orderkey; lineitem never materializes columns
# beyond the join key + predicate.
# --------------------------------------------------------------------------
@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    line = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        line,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# as-of join: each purchase event joined to the user's most recent earlier
# event of any other type. Implemented as a running `last(...) ignore
# nulls` window over the per-user timeline — one shuffle on user_id, no
# range-join explosion; this is the scalable as-of pattern when the probe
# and build stream share a partition key. (DuckDB mirrors with the same
# window, not its ASOF JOIN, to pin identical tie semantics.)
# --------------------------------------------------------------------------
@query(
    "ev_asof_last_touch",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ts
      FROM events
    )
    SELECT event_id, user_id, touch_type,
           CAST(date_sub('millisecond', touch_ts, ts) AS BIGINT) AS ms_since_touch
    FROM w WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def ev_asof_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    not_purchase = F.col("event_type") != "purchase"
    touched = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(not_purchase, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(not_purchase, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    return (
        touched.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "touch_type",
            (
                # cast("timestamp") is a no-op on TimestampType and legal on
                # TIMESTAMP_NTZ (read in the UTC session tz), so this stays
                # valid whichever encoding the lake's reader produced.
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("touch_ts").cast("timestamp"))
                )
                / 1000
            ).cast("long").alias("ms_since_touch"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# pivot: per-user-bucket event-type count matrix. Spark's pivot with an
# explicit value list stays a single groupBy (no second pass to discover
# values) — always pass the list at scale.
# --------------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "ev_event_pivot",
    oracle=f"""
    SELECT user_id % 100 AS bucket,
           {", ".join(f"count(*) FILTER (event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
    FROM events GROUP BY bucket ORDER BY bucket
    """,
)
def ev_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", F.col("user_id") % 100)
        .groupBy("bucket")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# skew-resistant exact distinct: the salted two-phase plan must equal the
# plain COUNT(DISTINCT) — the oracle proves the rewrite is lossless while
# the plan spreads each (hot) key over 16 reducers.
# --------------------------------------------------------------------------
@query(
    "ev_skew_distinct_users",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS distinct_count
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def ev_skew_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hogflare_spark.operators.skew import salted_two_phase_distinct

    ev = _t(spark, sf_dir, "events")
    return salted_two_phase_distinct(ev, ["event_type"], "user_id").orderBy(
        "event_type"
    )


# --------------------------------------------------------------------------
# approximate sketches (absent from the reference — SURVEY §2.6): HLL++
# distinct-user estimates. The raw sketch value is engine-specific (Spark
# HLL++ ≠ DuckDB's), so the gate emits the EXACT count plus an accuracy
# boolean (|approx-exact|/exact ≤ 5%, well above the 2% rsd) — the oracle
# computes the exact side and asserts the bound holds, turning an
# unverifiable sketch into a full hash-match gate that still runs the
# approx_count_distinct operator.
# --------------------------------------------------------------------------
@query(
    "ev_approx_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_5pct,
           count(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def ev_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.count_distinct("user_id")
    return (
        ev.groupBy("event_type")
        .agg(
            exact.alias("exact_users"),
            (
                F.abs(approx.cast("double") - exact.cast("double"))
                / exact.cast("double")
                <= 0.05
            ).alias("approx_within_5pct"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# exact percentiles (not approx): per order priority. Spark `percentile`
# and DuckDB `quantile_cont` both linearly interpolate, so values agree
# to rounding. At 100 TB you'd switch to approx_percentile and accept the
# sketch error — kept exact here because the oracle must hash-match.
# --------------------------------------------------------------------------
@query(
    "q_percentiles_totalprice",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_percentiles_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.90)), 4).alias("p90"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# approx_percentile — the quantile operator you actually run at 100 TB
# (the exact `percentile` buffers every value per group; the KLL-style
# sketch is bounded-memory). Gated with the same pattern as the
# approx-distinct gate: raw sketch output is engine-specific, so the
# gate emits the EXACT quantiles plus booleans asserting the sketch
# landed inside the exact (p ± 0.01)-quantile envelope — far looser than
# the sketch's 1e-4 rank error at accuracy=10000, and a full hash-match
# for the oracle, which computes the same envelope and TRUE literals.
# --------------------------------------------------------------------------
@query(
    "q_approx_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90,
           TRUE AS approx_p50_in_bounds,
           TRUE AS approx_p90_in_bounds
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")

    def in_bounds(p: float):
        approx = F.approx_percentile("o_totalprice", F.lit(p), F.lit(10000))
        lo = F.percentile("o_totalprice", F.lit(max(p - 0.01, 0.0)))
        hi = F.percentile("o_totalprice", F.lit(min(p + 0.01, 1.0)))
        return (approx >= lo) & (approx <= hi)

    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.90)), 4).alias("p90"),
            in_bounds(0.50).alias("approx_p50_in_bounds"),
            in_bounds(0.90).alias("approx_p90_in_bounds"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Revenue arithmetic discipline for the following TPC-H-shaped queries:
# l_extendedprice * (1 - l_discount) routes through DECIMAL so the sum is
# EXACT — double summation order differs between engines, and these
# queries aggregate/divide those sums. CAST(double AS DECIMAL) rounds
# identically (half-up) in Spark and DuckDB.
# --------------------------------------------------------------------------

_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(5,2))"


def _rev_col():
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(5,2)")


# q7 volume shipping: revenue between two nations by direction and year.
@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           round(CAST(sum({_REV_SQL}) AS DOUBLE), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_4')
        OR (sn.n_name = 'NATION_4' AND cn.n_name = 'NATION_3'))
      AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 23:59:59")
    )
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_4"))
            | ((F.col("supp_nation") == "NATION_4") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(F.round(F.sum(_rev_col()).cast("double"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# q14 promo revenue share: division of two exact sums.
@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum({_REV_SQL}) AS DOUBLE), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-03-01' AND l_shipdate < DATE '1997-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    rev = _rev_col()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return joined.agg(
        F.round(
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6
        ).alias("promo_pct")
    )


# q19 disjunctive predicates: three OR'd brand/size/quantity branches —
# the optimizer must push the common join key and evaluate the residual
# disjunction post-join without a cross product.
@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT round(CAST(sum({_REV_SQL}) AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    return joined.where(cond).agg(
        F.round(F.sum(_rev_col()).cast("double"), 2).alias("revenue")
    )


@query(
    "q_recursive_ancestors",
    oracle="""
    WITH RECURSIVE anc AS (
      SELECT p_partkey AS node, p_partkey >> 3 AS anc, 1 AS depth
      FROM part WHERE p_partkey > 0
      UNION ALL
      SELECT a.node, p.p_partkey >> 3 AS anc, a.depth + 1 AS depth
      FROM anc a JOIN part p ON p.p_partkey = a.anc
      WHERE p.p_partkey > 0
    )
    SELECT CAST(depth AS INT) AS depth,
           count(*) AS n_pairs,
           CAST(sum(node) AS BIGINT) AS sum_node,
           CAST(sum(anc) AS BIGINT) AS sum_anc,
           CAST(sum(node * anc) AS BIGINT) AS sum_prod
    FROM anc GROUP BY depth ORDER BY depth
    """,
)
def q_recursive_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE parity (operators/recursion.ancestor_closure):
    Spark SQL has no WITH RECURSIVE, so the ancestor closure of a
    parent-pointer hierarchy runs as semi-naive Datalog iteration —
    frontier-only joins against the edge relation (auto-broadcast only
    while it is dimension-sized: this gate's edges are one row per part
    row, so at large SF the iteration switches to a shuffle join
    instead of broadcasting a fact-sized frame per level), lineage cut
    per level. The hierarchy is derived deterministically from `part`
    (parent = p_partkey >> 3, a dense 8-ary forest rooted at 0, depth
    ~log8 |part|) so the DuckDB oracle can evaluate the SAME recursion
    with a real recursive CTE. The gate reduces the closure to exact
    per-depth integer invariants (pair count, key sums, sum of
    node*anc) — collision-resistant against pair-level errors while
    keeping the compared frame |depth|-sized."""
    from hogflare_spark.operators.recursion import ancestor_closure

    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") > 0)
    edges = part.select(
        F.col("p_partkey").alias("node"),
        F.shiftright("p_partkey", 3).alias("parent"),
    )
    closure = ancestor_closure(edges, max_depth=32)
    return (
        closure.groupBy(F.col("depth").cast("int").alias("depth"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("node").alias("sum_node"),
            F.sum("anc").alias("sum_anc"),
            F.sum(F.col("node") * F.col("anc")).alias("sum_prod"),
        )
        .orderBy("depth")
    )


@query(
    "q_triangle_count",
    oracle="""
    WITH nodes AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 4 = 0
    ), edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM nodes a JOIN nodes b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT (SELECT count(*) FROM edges) AS n_edges,
           (SELECT count(*) FROM edges e1
              JOIN edges e2 ON e2.u = e1.v
              JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed triangle counting (operators/graph.
    triangle_count) over the co-purchase graph: parts co-occurring in
    the same order are edges (vertex-sampled to partkey % 4 = 0 so the
    sf1 wedge set stays oracle-checkable; the filter is part of the
    graph definition on both engines, so the count is EXACT on the
    subgraph). Spark runs the degree-orientation plan — wedges only
    from the low-(deg,id) endpoint, O(m^1.5) total, reversed wedges
    dropped pre-shuffle — while the oracle's 3-way self-join enumerates
    the same triangles by the u<v convention; any acyclic orientation
    counts each triangle exactly once, so the two totals match
    bit-for-bit."""
    from hogflare_spark.operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_partkey") % 4 == 0)
    nodes = li.select("l_orderkey", "l_partkey")
    a = nodes.alias("a")
    b = nodes.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    return triangle_count(edges)


@query(
    "q_pagerank_parts",
    oracle="""
    WITH RECURSIVE nodes AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 4 = 0
    ), edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM nodes a JOIN nodes b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ), deg AS (
      SELECT src, count(*) AS outdeg FROM edges GROUP BY src
    ), pr AS (
      SELECT src AS node, CAST(1000000000000 AS BIGINT) AS rank, 0 AS it
      FROM deg
      UNION ALL
      SELECT e.dst AS node,
             CAST(150000000000 + (85 * sum(pr.rank // d.outdeg)) // 100
                  AS BIGINT) AS rank,
             pr.it + 1 AS it
      FROM pr
      JOIN edges e ON e.src = pr.node
      JOIN deg d ON d.src = pr.node
      WHERE pr.it < 8
      GROUP BY e.dst, pr.it
    )
    SELECT node, rank FROM pr WHERE it = 8
    ORDER BY rank DESC, node LIMIT 20
    """,
)
def q_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative link analysis (operators/graph.pagerank_fixed_point):
    8 synchronous PageRank rounds over the bidirected co-purchase graph
    (same vertex-sampled part graph as q_triangle_count), in pure
    BIGINT fixed-point so the ranks are bit-identical to the DuckDB
    WITH RECURSIVE oracle — float PageRank can never hash-match across
    engines because partial aggregation reorders the sums. Per
    iteration: one equi-join against the pinned degree-annotated edge
    list + one map-side-combined groupBy, lineage cut per round (the
    k-means / identity-fixpoint iterated-scan discipline). Output: the
    top-20 hub parts by rank."""
    from hogflare_spark.operators.graph import pagerank_fixed_point

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_partkey") % 4 == 0)
    nodes = li.select("l_orderkey", "l_partkey")
    a = nodes.alias("a")
    b = nodes.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    return (
        pagerank_fixed_point(edges, iterations=8)
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )
