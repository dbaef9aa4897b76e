"""Third TPC-H-shaped batch — the six variants that complete the 22-query
family: min-cost supplier (q2), important-stock value (q11), shipmode
priority (q12), supplier-part counts (q16), promotable suppliers (q20),
and waiting suppliers (q21).

The reference has no relational query engine of its own (SURVEY §0 — it
delegates querying to DuckDB over the Iceberg table, reference
README.md:237-256); these queries are the query layer we own on its
behalf. The synthetic schema has no `partsupp` table and no
shipmode/commitdate/receiptdate columns, so (as with q9's cost proxy in
relational_tpch2.py) each query keeps the ORIGINAL plan shape with a
derived stand-in:

- partsupp        → distinct (l_partkey, l_suppkey) pairs from lineitem,
                    ps_supplycost := min(l_extendedprice) as exact DECIMAL
                    (no division, so the q2 min-equality join can't split
                    on float noise)
- l_shipmode      → l_returnflag (q12's conditional-count shape is about
                    the fact-fact join + CASE aggregation, not the column)
- late delivery   → l_returnflag = 'R' on a finished ('F') order (q21's
                    point is the double-correlated EXISTS / NOT EXISTS
                    self-join, reformulated as one per-order aggregate)
- availqty > half → per-(supplier, part) shipped-quantity HAVING threshold
                    (q20's nested-semi-join chain is preserved)

All revenue/value arithmetic routes through DECIMAL so sums are exact and
engine-independent (rationale in plans/relational_ext.py); thresholds are
compared as exact decimals so the HAVING cut is identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hogflare_spark.plans import query
from hogflare_spark.sources.readers import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Derived part-supplier "catalog": the partsupp stand-in. One shuffle on
# the pair key; at 100 TB this is the same aggregation any catalog
# materialization would run, and it would be written once and bucketed by
# ps_partkey rather than recomputed per query.
_PS_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("ps_supplycost"))


def _eu_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in EUROPE with their nation name (dim-side, broadcast)."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_nation = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    return _t(spark, sf_dir, "supplier").join(
        F.broadcast(eu_nation), F.col("s_nationkey") == F.col("n_nationkey")
    )


# --------------------------------------------------------------------------
# q2 min-cost supplier: for each mid-size STANDARD part, the EUROPE
# supplier(s) achieving the minimum derived supply cost. The correlated
# min subquery becomes a per-part aggregate joined back on
# (part, exact-decimal cost equality) — the scalable reformulation Spark
# would pick anyway. The min side is keyed by part and deliberately NOT
# broadcast-hinted: at 100 TB it is |parts|-sized and AQE should choose.
# --------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           round(CAST(ps_supplycost AS DOUBLE), 2) AS supply_cost
    FROM ps JOIN eu ON ps_suppkey = s_suppkey
    JOIN part ON p_partkey = ps_partkey
    WHERE p_size BETWEEN 20 AND 30 AND p_type = 'STANDARD'
      AND ps_supplycost = (
        SELECT min(ps2.ps_supplycost)
        FROM ps ps2 JOIN eu eu2 ON ps2.ps_suppkey = eu2.s_suppkey
        WHERE ps2.ps_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _ps(spark, sf_dir)
    eu = _eu_suppliers(spark, sf_dir).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    parts = _t(spark, sf_dir, "part").where(
        F.col("p_size").between(20, 30) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_brand")
    cand = ps.join(F.broadcast(eu), F.col("ps_suppkey") == F.col("s_suppkey")).join(
        F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey")
    )
    min_cost = cand.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        cand.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round(F.col("ps_supplycost").cast("double"), 2).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


# --------------------------------------------------------------------------
# q11 important stock: per-part value held by EUROPE suppliers, keeping
# parts whose value exceeds a fraction of the total. The HAVING threshold
# is an uncorrelated scalar (1-row broadcast); both the per-part sum and
# the threshold stay exact DECIMAL, so the cut is identical in both
# engines — the rounded-double output can't flip membership.
# --------------------------------------------------------------------------
@query(
    "q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS ps_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS val
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT ps_partkey, round(CAST(sum(val) AS DOUBLE), 2) AS total_value
    FROM v GROUP BY ps_partkey
    HAVING sum(val) > (SELECT sum(val) * CAST(0.001 AS DECIMAL(6,4)) FROM v)
    ORDER BY total_value DESC, ps_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    eu = _eu_suppliers(spark, sf_dir).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    v = li.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey")).select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("val"),
    )
    per_part = v.groupBy("ps_partkey").agg(F.sum("val").alias("sum_val"))
    threshold = v.agg(
        (F.sum("val") * F.lit(0.001).cast("decimal(6,4)")).alias("thresh")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .where(F.col("sum_val") > F.col("thresh"))
        .select(
            "ps_partkey",
            F.round(F.col("sum_val").cast("double"), 2).alias("total_value"),
        )
        .orderBy(F.desc("total_value"), "ps_partkey")
    )


# --------------------------------------------------------------------------
# q12 shipmode priority (l_returnflag stands in for the absent
# l_shipmode): fact-fact join + CASE conditional counts. No join hint —
# orders and lineitem are both facts, so AQE picks broadcast at test
# scale and sort-merge on the shared orderkey at cluster scale.
# --------------------------------------------------------------------------
@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_returnflag AS ship_class,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# --------------------------------------------------------------------------
# q16 supplier-part counts: distinct-pair catalog joined to a filtered
# part dim, minus an excluded-supplier set (NOT IN → left-anti; keys are
# non-null so the two are equivalent), then a count-distinct per
# (brand, type, size). The exclusion set is a broadcast anti build side.
# --------------------------------------------------------------------------
@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem) ps
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    parts = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excluded = _t(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 2000.0
    ).select("s_suppkey")
    return (
        pairs.join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(excluded),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# q20 promotable suppliers: nested semi-join chain — suppliers with at
# least one (part LIKE '%gear%', year-1997) shipped-quantity aggregate
# above threshold. The HAVING aggregate runs first on the co-keyed pair,
# so only qualifying (supplier, part) pairs reach the semi join;
# quantities are integral, so the double sum is exact at any scale.
# --------------------------------------------------------------------------
@query(
    "q20_promotable_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%gear%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 50.0)
    ORDER BY s_suppkey
    """,
)
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    gear = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%")).select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    qualifying = (
        li.join(F.broadcast(gear), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50.0)
        .select("l_suppkey")
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        _t(spark, sf_dir, "supplier")
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# q21 waiting suppliers ('R' return on a finished order stands in for
# receipt-after-commit): the classic double-correlated EXISTS / NOT
# EXISTS self-join, reformulated as ONE per-order aggregate — an order
# qualifies iff it has >1 distinct suppliers and exactly one distinct
# supplier with an 'R' line, which is precisely "EXISTS another supplier
# AND NOT EXISTS another supplier who was also late". One shuffle on
# orderkey for the stats, one co-keyed join back — no O(n²) self-join.
# The oracle keeps the textbook EXISTS form to prove equivalence.
# --------------------------------------------------------------------------
@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    orders_f = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li_f = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey")).drop(
        "o_orderkey"
    )
    stats = li_f.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("r_supp"),
    )
    qualifying = stats.where(
        (F.col("n_supp") > 1) & (F.col("r_supp") == 1)
    ).select(F.col("l_orderkey").alias("q_orderkey"))
    r_lines = li_f.where(F.col("l_returnflag") == "R")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        r_lines.join(qualifying, F.col("l_orderkey") == F.col("q_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
