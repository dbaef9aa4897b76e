"""Second TPC-H-shaped batch: market share (q8), outer-join count
distribution (q13), view+scalar-max (q15), HAVING semi-join (q18), and an
adapted q22 (scalar-avg subquery + anti join; the synthetic schema has no
c_phone, so nation membership stands in for phone prefixes).

The reference has no relational query engine of its own (SURVEY §0 — it
delegates querying to DuckDB over the Iceberg table, reference
README.md:237-256); these queries are the query layer we own on its
behalf. Revenue arithmetic routes through DECIMAL so sums are exact and
engine-independent (see plans/relational_ext.py for the rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hogflare_spark.plans import query
from hogflare_spark.sources.readers import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(5,2))"


def _rev_col():
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(5,2)")


# --------------------------------------------------------------------------
# q8 market share: NATION_3's share of STANDARD-part revenue sold to
# EUROPE customers, by order year. Five dimension joins — all broadcast
# (nation/region/part/supplier/customer are the small sides at any scale
# factor; at 100 TB customer outgrows the broadcast threshold and AQE
# falls back to shuffle join on o_custkey, which is the right plan).
# Share = quotient of two exact decimal sums -> identical doubles.
# --------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(
             CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN {_REV_SQL}
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum({_REV_SQL}) AS DOUBLE), 6) AS mkt_share
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN part      ON l_partkey = p_partkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region    ON cn.n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
      AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    # EUROPE customers only: prune the customer build side before the join
    cust_eu = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.join(
                F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
            ).select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust_eu), F.col("o_custkey") == F.col("c_custkey"))
    )
    rev = _rev_col()
    n3 = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(n3).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# q13 customer distribution: LEFT OUTER join + two-level aggregation (the
# classic "count bug" shape — customers with zero orders must survive as
# c_count = 0). One shuffle on custkey, one tiny shuffle on c_count.
# --------------------------------------------------------------------------
@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# q15 top supplier: quarterly revenue per supplier, keep the max. The max
# is an exact DECIMAL, so the equality join can't be split by float noise.
# The 1-row max side is broadcast — no second shuffle of the revenue view.
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum({_REV_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(CAST(total_rev AS DOUBLE), 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_col()).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# q18 large-volume customers: HAVING over a fact-side aggregate, then a
# key join back. The per-order quantity aggregate runs FIRST (map-side
# partials on l_orderkey), so only the ~0.3% of orders above threshold
# reach the join — the build side shrinks before any wide row moves.
# Quantities are integral, so double sums are exact at any scale.
# --------------------------------------------------------------------------
@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(l_quantity) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 300
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_sum"))
        .where(F.col("qty_sum") > 300)
        .select("l_orderkey", F.col("qty_sum").cast("long").alias("total_qty"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(qty), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


# --------------------------------------------------------------------------
# q22 shape (adapted — no c_phone column in the synthetic schema, so the
# "country code IN (...)" predicate becomes nation membership): customers
# with above-average positive balance and NO orders. Scalar subquery
# (uncorrelated, broadcast 1-row) + left-anti join on the orders fact.
# The average routes through an exact decimal sum so the threshold is the
# same double in both engines.
# --------------------------------------------------------------------------
@query(
    "q22_idle_balances",
    oracle="""
    SELECT n_name, count(*) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_7', 'NATION_13', 'NATION_19', 'NATION_24')
      AND c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name ORDER BY n_name
    """,
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_7", "NATION_13", "NATION_19", "NATION_24")
    )
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2
            ).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# GROUPING SETS (beyond the rollup/cube gates): two independent 1-D
# aggregates plus the grand total in ONE pass over orders — Spark expands
# the sets with a single Expand node feeding one hash aggregate, so the
# fact table is scanned once however many sets there are. GROUPING()
# markers disambiguate "NULL because grouped-away" from data NULLs.
# --------------------------------------------------------------------------
def _grouping_sets_sql(table: str) -> str:
    return f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
           coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
    FROM {table}
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus, o_orderpriority
    """


@query("q_grouping_sets_revenue", oracle=_grouping_sets_sql("orders"))
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(_grouping_sets_sql("v_orders_gs"))


# --------------------------------------------------------------------------
# UNPIVOT (wide → long): per-priority metrics melted to (priority, metric,
# value) rows with stack() — a generator expression, no shuffle beyond the
# feeding aggregate. The oracle mirrors with UNION ALL (portable and
# column-order deterministic, unlike engine-specific UNPIVOT syntax).
# --------------------------------------------------------------------------
@query(
    "q_unpivot_priority_metrics",
    oracle="""
    WITH w AS (
      SELECT o_orderpriority,
             CAST(count(*) AS DOUBLE) AS n_orders,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
             CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_cust
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, metric, value FROM (
      SELECT o_orderpriority, 'n_cust' AS metric, n_cust AS value FROM w
      UNION ALL SELECT o_orderpriority, 'n_orders', n_orders FROM w
      UNION ALL SELECT o_orderpriority, 'revenue', revenue FROM w
    )
    ORDER BY o_orderpriority, metric
    """,
)
def q_unpivot_priority_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("revenue"),
        F.count_distinct("o_custkey").cast("double").alias("n_cust"),
    )
    return (
        wide.select(
            "o_orderpriority",
            F.expr(
                "stack(3, 'n_cust', n_cust, 'n_orders', n_orders, "
                "'revenue', revenue) AS (metric, value)"
            ),
        )
        .orderBy("o_orderpriority", "metric")
    )


# --------------------------------------------------------------------------
# Range join (non-equi): orders matched to overlapping 90-day "season"
# windows that start every 100 days — windows deliberately straddle
# bucket edges. The naive plan is a BroadcastNestedLoopJoin (every row
# against every range); the scalable shape used here buckets time into
# fixed 128-day cells, explodes each season into the cells it overlaps
# (<= 2), equi-joins on the cell id, and applies the range predicate as a
# residual — O(rows * overlap) instead of O(rows * ranges). At 100 TB
# with a big ranges side, the same cell key becomes the shuffle key.
# --------------------------------------------------------------------------
@query(
    "q_range_join_seasons",
    oracle="""
    WITH seasons AS (
      SELECT i AS season_id,
             DATE '1995-01-01' + INTERVAL (i * 100) DAY AS season_start,
             DATE '1995-01-01' + INTERVAL (i * 100 + 89) DAY AS season_end
      FROM range(0, 25) t(i)
    )
    SELECT season_id, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
    FROM orders JOIN seasons
      ON o_orderdate >= season_start AND o_orderdate <= season_end
    GROUP BY season_id ORDER BY season_id
    """,
)
def q_range_join_seasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket_days = 128
    epoch = F.lit("1995-01-01").cast("date")
    seasons = spark.range(0, 25).select(
        F.col("id").alias("season_id"),
        F.date_add(epoch, (F.col("id") * 100).cast("int")).alias("season_start"),
        F.date_add(epoch, (F.col("id") * 100 + 89).cast("int")).alias("season_end"),
    )
    # explode each season into the time cells it overlaps (<= 2 here)
    cells = seasons.select(
        "season_id",
        "season_start",
        "season_end",
        F.explode(
            F.sequence(
                F.floor(F.datediff("season_start", epoch) / bucket_days),
                F.floor(F.datediff("season_end", epoch) / bucket_days),
            )
        ).alias("cell"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderdate",
        "o_totalprice",
        F.floor(F.datediff(F.col("o_orderdate"), epoch) / bucket_days).alias("cell"),
    )
    joined = orders.join(F.broadcast(cells), "cell").where(
        (F.col("o_orderdate") >= F.col("season_start"))
        & (F.col("o_orderdate") <= F.col("season_end"))
    )
    return (
        joined.groupBy("season_id")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("revenue"),
        )
        .orderBy("season_id")
    )


# --------------------------------------------------------------------------
# q9 shape (product-type profit by nation and year). The synthetic schema
# has no partsupp/ps_supplycost, so cost is proxied as 10% of
# p_retailprice per unit — the plan shape (LIKE-filtered part dim
# broadcast into the fact, supplier→nation broadcast, two-key groupBy) is
# the point, and all arithmetic stays in DECIMAL so the profit sums are
# engine-exact.
# --------------------------------------------------------------------------
_PROFIT_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(5,2))"
    " - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(12,2))"
    " * CAST(0.1 AS DECIMAL(4,2))"
)


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS supp_nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(CAST(sum({_PROFIT_SQL}) AS DOUBLE), 2) AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, o_year
    ORDER BY supp_nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    profit = _rev_col() - (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
        * F.lit(0.1).cast("decimal(4,2)")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("profit"))
        .orderBy("supp_nation", F.desc("o_year"))
    )
