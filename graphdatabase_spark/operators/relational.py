"""Relational operator surface (SURVEY.md §2.3 — "relational core").

The reference has no relational operators at all (its complete dispatch
is ops 1-4, ``Assignment2/client.c:385-400``); this module is the
target-inventory relational surface, implemented purely with built-in
Catalyst expressions so predicate pushdown, column pruning, join
selection (broadcast vs sort-merge), AQE skew handling and whole-stage
codegen all apply with zero custom code.

Every query here is paired with an ANSI-SQL oracle (`ORACLES`) that
DuckDB runs over the same parquet; the driver hash-compares values.

Float determinism contract: any aggregate over float columns first
casts the value (or each factor) to DECIMAL — decimal addition is exact
and associative, so Spark's partial-aggregation order and DuckDB's
serial order produce the same number — then casts the final result to
DOUBLE. Plain SUM(double) would differ in the last ulp between engines
and fail the driver's value-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabase_spark.sources.tables import load_table


def _dec(col: str, scale: int = 2) -> F.Column:
    """Exact-arithmetic view of a money-ish double column."""
    return F.col(col).cast(f"decimal(18,{scale})")


def _dsum(col_expr: F.Column) -> F.Column:
    return F.sum(col_expr).cast("double")


# ---------------------------------------------------------------------------
# q_pricing_summary — TPC-H Q1 shape: scan + filter + hash agg + sort.
# Catalyst: filter and the 7-column projection push into the parquet scan;
# partial aggregation is map-side, one shuffle on (returnflag, linestatus).
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(_dec("l_quantity")).alias("sum_qty"),
            _dsum(_dec("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (_dsum(_dec("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (_dsum(_dec("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            (_dsum(_dec("l_discount")) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q_revenue_by_nation — star join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
# region. nation/region are broadcast (tiny dims); customer⋈orders⋈lineitem
# shuffle on the fact keys; AQE picks broadcast for customer at small SF and
# SMJ at large SF.
# ---------------------------------------------------------------------------

def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).alias("rev"))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(_dsum(F.col("rev")).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


ORACLE_REVENUE_BY_NATION = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# q_shipping_priority — TPC-H Q3 shape: selective filters on both join sides
# (pushed to scans) + join + agg + top-k. LIMIT with a deterministic
# tiebreak (orderkey) so the oracle hash matches.
# ---------------------------------------------------------------------------

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    ).select("l_orderkey", (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).alias("rev"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("rev")).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q_customers_without_orders — anti join (null-producing outer joins and
# semi/anti are the join-family coverage; inner/semi exercised above).
# The date filter keeps the result non-empty in the synthetic data (every
# customer has *some* order) so the oracle check isn't a trivial 0-row match.
# ---------------------------------------------------------------------------

def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")


ORACLE_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_custkey IS NOT NULL
                          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
"""


# ---------------------------------------------------------------------------
# q_order_priority_rollup — ROLLUP + GROUPING() (grouping-sets family).
# ---------------------------------------------------------------------------

def q_order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(_dec("o_totalprice")).alias("total_price"),
        )
    )


ORACLE_ORDER_PRIORITY_ROLLUP = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# q_returns_cube — CUBE: all 2^k grouping sets in one pass (the other
# half of the grouping-sets family; same expand-then-aggregate plan).
# ---------------------------------------------------------------------------

def q_returns_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count(F.lit(1)).alias("n_items"),
            _dsum(_dec("l_quantity")).alias("sum_qty"),
        )
    )


ORACLE_RETURNS_CUBE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# q_top_orders_per_customer — window functions: partitioned row_number
# top-k (the scalable per-group top-k: one shuffle on the partition key,
# no global sort).
# ---------------------------------------------------------------------------

def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey",
                F.col("o_totalprice").alias("totalprice"), "rnk")
    )


ORACLE_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice AS totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# q_running_revenue — window frame (lag + running sum over ordered frame).
# ---------------------------------------------------------------------------

def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.sum(_dec("o_totalprice")).alias("revenue_dec"))
    )
    w = Window.orderBy("month")
    # The running sum is computed in DECIMAL too: windowed SUM(double) is
    # association-order-dependent (DuckDB uses a segment tree) and differs
    # in the last ulp from Spark's running accumulation.
    return monthly.select(
        "month",
        F.col("revenue_dec").cast("double").alias("revenue"),
        F.lag(F.col("revenue_dec").cast("double"), 1).over(w).alias("prev_revenue"),
        F.sum("revenue_dec").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double").alias("cum_revenue"),
    )


ORACLE_RUNNING_REVENUE = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue_dec
  FROM orders GROUP BY 1
)
SELECT month,
       CAST(revenue_dec AS DOUBLE) AS revenue,
       LAG(CAST(revenue_dec AS DOUBLE), 1) OVER (ORDER BY month) AS prev_revenue,
       CAST(SUM(revenue_dec) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue
FROM monthly
"""


# ---------------------------------------------------------------------------
# q_top_expensive_orders — global sort + limit with deterministic tiebreak.
# Spark executes this as TakeOrderedAndProject (no full sort materialized).
# ---------------------------------------------------------------------------

def q_top_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


ORACLE_TOP_EXPENSIVE_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
"""


# ---------------------------------------------------------------------------
# q_segment_distinct_customers — distinct aggregate + plain agg together.
# ---------------------------------------------------------------------------

def q_segment_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey", "c_acctbal")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(_dec("c_acctbal")).alias("total_acctbal"),
        )
    )


ORACLE_SEGMENT_DISTINCT_CUSTOMERS = """
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer GROUP BY c_mktsegment
"""


def q_pivot_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab) surface: revenue per l_linestatus with one
    column per l_returnflag value — ``groupBy().pivot(values)``.
    Passing the value list explicitly matters at scale: without it
    Spark runs an extra distinct-scan job just to discover the
    columns. The pivot compiles to the same conditional-aggregate
    plan the oracle spells out — one map-side-combined shuffle, no
    extra pass."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    piv = (li.select("l_linestatus", "l_returnflag", rev.alias("rev"))
           .groupBy("l_linestatus")
           .pivot("l_returnflag", ["A", "N", "R"])
           .agg(F.sum("rev")))
    return piv.select(
        "l_linestatus",
        F.col("A").cast("double").alias("rev_a"),
        F.col("N").cast("double").alias("rev_n"),
        F.col("R").cast("double").alias("rev_r"))


_PIV_REV = ("CAST(l_extendedprice AS DECIMAL(18,2)) * "
            "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))")

ORACLE_PIVOT_RETURNS = f"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN l_returnflag = 'A' THEN {_PIV_REV} END) AS DOUBLE) AS rev_a,
       CAST(SUM(CASE WHEN l_returnflag = 'N' THEN {_PIV_REV} END) AS DOUBLE) AS rev_n,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN {_PIV_REV} END) AS DOUBLE) AS rev_r
FROM lineitem
GROUP BY l_linestatus
"""


def q_segment_distinct_customers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB distinct-count path: HyperLogLog++ sketches
    (``approx_count_distinct``, rsd 1%) instead of exact
    ``countDistinct``. Exact distinct aggregation shuffles every
    distinct (group, key) pair — O(distinct values) network; the HLL
    sketch is constant-size per group and merges map-side, so the
    shuffle is O(groups) regardless of cardinality. Registered
    rows-only (sketch estimates are engine-specific); the rsd-bound
    accuracy vs the exact operator is pinned by a unit test."""
    cust = load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey")
    return (cust.groupBy("c_mktsegment")
            .agg(F.approx_count_distinct("c_nationkey", rsd=0.01).alias("n_nations"),
                 F.count(F.lit(1)).alias("n_customers")))


# ---------------------------------------------------------------------------
# q_set_ops — union / intersect / except coverage over key sets.
# Customers that placed an order vs customers with positive balance.
# ---------------------------------------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    with_orders = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    positive = cust.filter(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("custkey"))
    both = with_orders.intersect(positive).withColumn("bucket", F.lit("both"))
    only_orders = with_orders.exceptAll(positive).withColumn("bucket", F.lit("orders_only"))
    only_pos = positive.exceptAll(with_orders).withColumn("bucket", F.lit("positive_only"))
    return both.unionByName(only_orders).unionByName(only_pos).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"))


ORACLE_SET_OPS = """
WITH with_orders AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
     positive AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0),
     labeled AS (
       SELECT custkey, 'both' AS bucket FROM (SELECT custkey FROM with_orders INTERSECT SELECT custkey FROM positive)
       UNION ALL
       SELECT custkey, 'orders_only' AS bucket FROM (SELECT custkey FROM with_orders EXCEPT ALL SELECT custkey FROM positive)
       UNION ALL
       SELECT custkey, 'positive_only' AS bucket FROM (SELECT custkey FROM positive EXCEPT ALL SELECT custkey FROM with_orders)
     )
SELECT bucket, COUNT(*) AS n FROM labeled GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# q_scalar_functions — scalar-function coverage: string, date, math,
# conditional, regex — all whole-stage-codegen expressions.
# ---------------------------------------------------------------------------

def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.when(F.col("p_size") >= 25, "large").when(F.col("p_size") >= 10, "medium")
            .otherwise("small").alias("size_class"),
        # DECIMAL-exact markup: round(double*1.1, 2) rounds the shortest
        # decimal repr in Spark but the binary value in DuckDB — they
        # disagree on half-way cents (e.g. 1.15·1.1). Decimal multiply
        # is exact and both engines round it half-away-from-zero.
        F.round(F.col("p_retailprice").cast("decimal(18,2)")
                * F.lit("1.1").cast("decimal(2,1)"), 2)
            .cast("double").alias("marked_up"),
        F.abs(F.col("p_size") - 25).cast("int").alias("size_dist"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_first_word"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#00")), F.lit("unbranded")).alias("brand_or_default"),
    )


ORACLE_SCALAR_FUNCTIONS = r"""
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       substr(p_name, 1, 8) AS name_prefix,
       LENGTH(p_name) AS name_len,
       CASE WHEN p_size >= 25 THEN 'large' WHEN p_size >= 10 THEN 'medium' ELSE 'small' END AS size_class,
       CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS marked_up,
       CAST(ABS(p_size - 25) AS INT) AS size_dist,
       regexp_extract(p_type, '^(\w+)', 1) AS type_first_word,
       COALESCE(NULLIF(p_brand, 'Brand#00'), 'unbranded') AS brand_or_default
FROM part
"""


# ---------------------------------------------------------------------------
# q_local_supplier_volume — TPC-H Q5 shape: 6-way join where supplier and
# customer must be in the same nation. Exercises join reordering + two
# broadcast dims.
# ---------------------------------------------------------------------------

def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).alias("rev"))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(_dsum(F.col("rev")).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


ORACLE_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# q_promo_revenue — TPC-H Q14 shape: conditional aggregation (promo share of
# one month's revenue). part is broadcast; the shipdate band pushes into the
# lineitem scan; ratio of two decimal-exact sums, divided once in double.
# ---------------------------------------------------------------------------

def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).alias("rev"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(F.lit(0).cast("decimal(18,2)"))).cast("double")
    return joined.agg(
        (F.lit(100.0) * promo / _dsum(F.col("rev"))).alias("promo_pct"),
        promo.alias("promo_revenue"),
        _dsum(F.col("rev")).alias("total_revenue"),
    )


ORACLE_PROMO_REVENUE = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_pct,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
"""


# ---------------------------------------------------------------------------
# q_top_supplier — TPC-H Q15 shape: aggregate-then-max-scalar-subquery,
# decorrelated to agg → window-max filter (one shuffle on suppkey, the max
# is a single-pass window over the tiny per-supplier aggregate).
# ---------------------------------------------------------------------------

def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select("l_suppkey", (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).alias("rev"))
    rev = li.groupBy("l_suppkey").agg(_dsum(F.col("rev")).alias("total_revenue"))
    top = rev.withColumn("mx", F.max("total_revenue").over(Window.partitionBy())) \
             .filter(F.col("total_revenue") == F.col("mx")).drop("mx")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(F.broadcast(supp), top.l_suppkey == supp.s_suppkey) \
              .select("s_suppkey", "s_name", "total_revenue")


ORACLE_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


# ---------------------------------------------------------------------------
# q_small_qty_revenue — TPC-H Q17 shape: correlated scalar subquery (per-part
# average quantity) decorrelated into an aggregate + equi-join; both engines
# compute the threshold from the identical decimal-sum/count double, so the
# float comparison is deterministic.
# ---------------------------------------------------------------------------

def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li_brand = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    avg_qty = li.groupBy("l_partkey").agg(
        (_dsum(_dec("l_quantity")) / F.count(F.lit(1))).alias("avg_qty")).withColumnRenamed("l_partkey", "a_partkey")
    return (
        li_brand.join(avg_qty, li_brand.l_partkey == avg_qty.a_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((_dsum(_dec("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
             F.count(F.lit(1)).alias("n_items"))
    )


ORACLE_SMALL_QTY_REVENUE = """
WITH avg_qty AS (
  SELECT l_partkey AS a_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#3'
JOIN avg_qty ON l_partkey = a_partkey
WHERE l_quantity < 0.5 * avg_qty
"""


# ---------------------------------------------------------------------------
# q_large_volume_customers — TPC-H Q18 shape: GROUP BY + HAVING feeding a
# semi-join back against the fact (big-order keys), then customer enrich +
# deterministic top-k. The HAVING aggregate is map-side-combined; the
# orderkey list re-joins lineitem on its natural key (no second scan shape
# change at scale — AQE picks SMJ when the key list outgrows broadcast).
# ---------------------------------------------------------------------------

def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = li.groupBy("l_orderkey").agg(_dsum(_dec("l_quantity")).alias("sum_qty")) \
            .filter(F.col("sum_qty") > 120)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                F.col("o_totalprice").alias("total_price"), "sum_qty")
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(100)
    )


ORACLE_LARGE_VOLUME_CUSTOMERS = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice AS total_price, sum_qty
FROM (SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 120) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q_disjunctive_revenue — TPC-H Q19 shape: OR-of-ANDs predicate across both
# join sides. Catalyst extracts the common `l_partkey = p_partkey` equi-key
# so this stays a hash join (not BNLJ) with the disjunction evaluated as a
# post-join filter, and pushes the per-side prunable conjuncts
# (quantity/size bands) into the scans.
# ---------------------------------------------------------------------------

def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity",
        (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).alias("rev"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(_dsum(F.col("rev")).alias("revenue"), F.count(F.lit(1)).alias("n_items"))


ORACLE_DISJUNCTIVE_REVENUE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# q_sales_opportunity — TPC-H Q22 shape: scalar subquery (global average
# balance) + anti join (no recent orders; the date band keeps the result
# non-empty — every synthetic customer has *some* order), grouped by nation.
# The scalar average is a one-row broadcast; the anti join is the same
# null-safe shape as customers_without_orders.
# ---------------------------------------------------------------------------

def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0)
               .agg((_dsum(_dec("c_acctbal")) / F.count(F.lit(1))).alias("ab")))
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"),
             _dsum(_dec("c_acctbal")).alias("total_acctbal"))
    )


ORACLE_SALES_OPPORTUNITY = """
SELECT c_nationkey, COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_custkey IS NOT NULL
                          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# q_summary_stats — df.describe() parity, exact: count / min / max / mean /
# sample std per numeric column in ONE map-side-combined pass. Never
# F.stddev (float partial-agg order differs between engines): values
# quantize to integer cents, sums and sums-of-squares accumulate exactly
# (decimal(38,0) — the sum-of-squares outgrows int64 at sf ≥ 0.1), and the
# variance numerator n·Σx²−(Σx)² is divided ONCE in double, then sqrt.
# ---------------------------------------------------------------------------

def _stats_cols(col: str, tag: str) -> list[F.Column]:
    c = F.round(F.col(col) * 100).cast("long")
    n = F.count(F.lit(1))
    sum_c = F.sum(c).cast("decimal(38,0)")
    ssq_c = F.sum((c * c).cast("decimal(38,0)"))
    var_num = (n.cast("decimal(38,0)") * ssq_c - sum_c * sum_c).cast("double")
    return [
        F.min(F.col(col)).alias(f"{tag}_min"),
        F.max(F.col(col)).alias(f"{tag}_max"),
        (F.sum(c).cast("double") / n / 100.0).alias(f"{tag}_mean"),
        # Denominator as a DOUBLE product: n·(n−1) in int64 wraps past
        # 2^63 once n > ~3e9 rows (inside the 100 TB envelope); the
        # oracle spells the identical double arithmetic.
        (F.sqrt(var_num / (n.cast("double") * (n - F.lit(1)).cast("double")))
         / 100.0).alias(f"{tag}_std"),
    ]


def q_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *_stats_cols("l_quantity", "qty"),
        *_stats_cols("l_extendedprice", "price"),
        *_stats_cols("l_discount", "disc"),
    )


def _stats_sql(col: str, tag: str) -> str:
    c = f"CAST(round({col} * 100) AS BIGINT)"
    return (
        f"MIN({col}) AS {tag}_min, MAX({col}) AS {tag}_max,\n"
        f"       CAST(SUM({c}) AS DOUBLE) / COUNT(*) / 100.0 AS {tag}_mean,\n"
        f"       sqrt(CAST(COUNT(*) * SUM({c} * {c}) - SUM({c}) * SUM({c}) AS DOUBLE)"
        f" / (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) - 1 AS DOUBLE))) / 100.0 AS {tag}_std"
    )


ORACLE_SUMMARY_STATS = f"""
SELECT COUNT(*) AS n_rows,
       {_stats_sql('l_quantity', 'qty')},
       {_stats_sql('l_extendedprice', 'price')},
       {_stats_sql('l_discount', 'disc')}
FROM lineitem
"""


# ---------------------------------------------------------------------------
# q_customer_distribution — TPC-H Q13 shape: CONDITIONAL left outer join
# (the filter lives in the join condition, not a WHERE — customers with
# only filtered-out orders must still count as 0) + two-level aggregation
# (per-customer order count, then the distribution of those counts).
# Scale shape: both aggs are map-side combined; the outer join shuffles
# on custkey once and the second agg's domain is tiny (distinct counts).
# ---------------------------------------------------------------------------

def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        cust.join(orders,
                  (cust.c_custkey == orders.o_custkey)
                  & (orders.o_orderpriority != "1-URGENT"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


ORACLE_CUSTOMER_DISTRIBUTION = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# q_waiting_suppliers — TPC-H Q21 shape: the double-correlated
# EXISTS / NOT EXISTS self-join. For finalized ('F') orders, a supplier
# "kept the order waiting" if their lines shipped late while EXISTS
# another supplier on the same order and NOT EXISTS another supplier who
# was ALSO late (they were the sole bottleneck). The testdata lineitem
# has no commit/receipt dates, so late-ness is the ship lag proxy:
# l_shipdate > o_orderdate + 90 days (semantics differ from pristine
# Q21; the PLAN SHAPE — semi + anti self-joins on the supplier-order
# pair set — is the point). Scale shape: the self-joins run on the
# DISTINCT (orderkey, suppkey) pair set (one map-side-combined agg
# upstream), never on raw lineitem; counts group by supplier nation.
# ---------------------------------------------------------------------------

def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    fo = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    pairs = (
        li.join(fo, li.l_orderkey == fo.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max((F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
                   .cast("int")).alias("late")))
    l1 = pairs.filter(F.col("late") == 1).select(
        F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("skey"))
    others = pairs.select(F.col("l_orderkey").alias("o2"),
                          F.col("l_suppkey").alias("s2"), "late")
    waiting = (
        l1.join(others, (F.col("okey") == F.col("o2"))
                & (F.col("skey") != F.col("s2")), "left_semi")
        .join(others.filter(F.col("late") == 1),
              (F.col("okey") == F.col("o2"))
              & (F.col("skey") != F.col("s2")), "left_anti"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    return (waiting.join(supp, waiting.skey == supp.s_suppkey)
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("numwait")))


ORACLE_WAITING_SUPPLIERS = """
WITH pairs AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2)
SELECT s_nationkey, COUNT(*) AS numwait
FROM pairs l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.late = 1
  AND EXISTS (SELECT 1 FROM pairs l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM pairs l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
GROUP BY s_nationkey
"""


# ---------------------------------------------------------------------------
# q_volume_shipping — TPC-H Q7 shape: the two-sided nation-pair join.
# lineitem reaches BOTH a supplier-side nation and a customer-side nation
# (through orders), with a DISJUNCTIVE cross-side pair predicate
# ((A,B) OR (B,A)) that Catalyst cannot push to either scan alone, and
# grouping by the derived ship YEAR. Scale shape: both nation maps are
# broadcast; the only big shuffles are the fact-side joins.
# ---------------------------------------------------------------------------

def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust = (load_table(spark, sf_dir, "customer")
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", F.col("n_name").alias("cust_nation")))
    orders = (load_table(spark, sf_dir, "orders")
              .select("o_orderkey", "o_custkey")
              .join(cust, F.col("o_custkey") == F.col("c_custkey"))
              .select("o_orderkey", "cust_nation"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.year("l_shipdate").alias("l_year"),
        (_dec("l_extendedprice")
         * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).alias("rev"))
    pair = ((F.col("supp_nation") == "NATION_1")
            & (F.col("cust_nation") == "NATION_2")) | \
           ((F.col("supp_nation") == "NATION_2")
            & (F.col("cust_nation") == "NATION_1"))
    return (li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(_dsum(F.col("rev")).alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


ORACLE_VOLUME_SHIPPING = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q_market_share — TPC-H Q8 shape: ratio-of-conditional-aggregates over the
# widest join in the suite (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders ⋈
# customer ⋈ nation ⋈ region): NATION_1's share of ECONOMY-part revenue
# inside region ASIA per order year. Both numerator and denominator
# accumulate in exact decimal and divide ONCE in double, so the ratio is
# engine-deterministic (the module's float contract).
# ---------------------------------------------------------------------------

def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    part = (load_table(spark, sf_dir, "part")
            .filter(F.col("p_type") == "ECONOMY").select("p_partkey"))
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA").select("r_regionkey")
    cust = (load_table(spark, sf_dir, "customer")
            .join(F.broadcast(nation.join(
                F.broadcast(region),
                F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")),
                F.col("c_nationkey") == F.col("n_nationkey"), "left_semi")
            .select("c_custkey"))
    orders = (load_table(spark, sf_dir, "orders")
              .select("o_orderkey", "o_custkey",
                      F.year("o_orderdate").alias("o_year"))
              .join(cust, F.col("o_custkey") == F.col("c_custkey"),
                    "left_semi"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (_dec("l_extendedprice")
         * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).alias("rev"))
    joined = (li.join(part, F.col("l_partkey") == F.col("p_partkey"),
                      "left_semi")
              .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
              .join(orders, F.col("l_orderkey") == F.col("o_orderkey")))
    nat_rev = F.sum(F.when(F.col("supp_nation") == "NATION_1",
                           F.col("rev")).otherwise(F.lit(0).cast("decimal(18,4)")))
    return (joined.groupBy("o_year")
            .agg((nat_rev.cast("double")
                  / F.sum(F.col("rev")).cast("double")).alias("mkt_share"),
                 _dsum(F.col("rev")).alias("total_rev")))


ORACLE_MARKET_SHARE = """
WITH j AS (
  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
    AND o_custkey IN (
      SELECT c_custkey FROM customer
      WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_regionkey IN (SELECT r_regionkey FROM region
                              WHERE r_name = 'ASIA'))))
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN rev
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(rev) AS DOUBLE) AS mkt_share,
       CAST(SUM(rev) AS DOUBLE) AS total_rev
FROM j
GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# q_min_cost_supplier — TPC-H Q2 shape: the correlated scalar-MIN
# subquery ("the supplier offering the minimum cost for each part"),
# decorrelated as one grouped MIN + a per-part window MIN + an equality
# filter. The testdata has no partsupp, so "cost" is the minimum
# l_extendedprice a supplier ever charged for the part (exact DECIMAL,
# so the min-equality join-back is engine-deterministic). Scale shape:
# the part filter semi-joins (broadcast) BEFORE the grouped agg so only
# qualifying parts' lineitems shuffle; the window MIN reuses the
# group-by's hash partitioning on l_partkey (no second shuffle).
# ---------------------------------------------------------------------------

def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    parts = (load_table(spark, sf_dir, "part")
             .filter((F.col("p_size") <= 10) & (F.col("p_type") == "LARGE"))
             .select("p_partkey"))
    cost = (load_table(spark, sf_dir, "lineitem")
            .select("l_partkey", "l_suppkey",
                    _dec("l_extendedprice").alias("price"))
            .join(F.broadcast(parts),
                  F.col("l_partkey") == F.col("p_partkey"), "left_semi")
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.min("price").alias("cost")))
    best = (cost
            .withColumn("min_cost",
                        F.min("cost").over(Window.partitionBy("l_partkey")))
            .filter(F.col("cost") == F.col("min_cost")))
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_acctbal", "n_name"))
    return (best.join(supp, best.l_suppkey == supp.s_suppkey)
            .select(F.col("l_partkey").alias("p_partkey"), "s_suppkey",
                    F.col("cost").cast("double").alias("min_cost"),
                    "s_acctbal", "n_name"))


ORACLE_MIN_COST_SUPPLIER = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_size <= 10 AND p_type = 'LARGE')
  GROUP BY 1, 2)
SELECT c.l_partkey AS p_partkey, c.l_suppkey AS s_suppkey,
       CAST(c.cost AS DOUBLE) AS min_cost, s_acctbal, n_name
FROM cost c
JOIN supplier ON c.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE c.cost = (SELECT MIN(c2.cost) FROM cost c2
                WHERE c2.l_partkey = c.l_partkey)
"""


# ---------------------------------------------------------------------------
# q_product_profit — TPC-H Q9 shape: profit by supplier nation and order
# year over the 5-way star join (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈
# orders) with the profit expression spanning two tables. Without
# partsupp, supply cost is proxied as 10% of p_retailprice per unit.
# Decimal discipline: qty is cast DECIMAL(9,0) (quantities are integral)
# so every product stays within precision 38 EXACTLY in both engines —
# rp(18,2) × qty(9,0) × 0.10(3,2) and amt(18,2)×(1-disc) never hit
# Spark's precision-loss rounding. Scale shape: part and nation
# broadcast; the two fact-side joins (supplier via broadcast-sized dim,
# orders on orderkey) are the only shuffles before one map-side-combined
# agg on a tiny (nation, year) domain.
# ---------------------------------------------------------------------------

def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (load_table(spark, sf_dir, "part")
            .filter(F.col("p_name").contains("widget"))
            .select("p_partkey", _dec("p_retailprice").alias("rp")))
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "n_name"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        F.col("l_quantity").cast("decimal(9,0)").alias("qty"),
        (_dec("l_extendedprice")
         * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).alias("amt"))
    profit = (F.col("amt")
              - F.col("rp") * F.col("qty")
                * F.lit("0.10").cast("decimal(3,2)"))
    return (li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("n_name", "o_year")
            .agg(_dsum(profit).alias("profit"),
                 F.count(F.lit(1)).alias("n_items")))


ORACLE_PRODUCT_PROFIT = """
SELECT n_name, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(9,0))
                  * CAST(0.10 AS DECIMAL(3,2))) AS DOUBLE) AS profit,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_important_parts — TPC-H Q11 shape: HAVING against a GLOBAL scalar
# subquery (keep the groups whose share of the grand total exceeds a
# fraction). Part "value" is shipped quantity × unit price restricted to
# three nations' suppliers. The fraction compare is integer-scaled
# (val × 1000 > total) so no sub-cent decimal threshold exists to
# round differently across engines. Scale shape: the supplier semi-join
# broadcasts; ONE shuffle for the per-part agg; the grand total is a
# 1-row broadcast cross join (Q11's classic decorrelation), never a
# driver collect.
# ---------------------------------------------------------------------------

def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = (load_table(spark, sf_dir, "nation")
           .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
           .select("n_nationkey"))
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(nat),
                  F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
            .select("s_suppkey"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_quantity").cast("decimal(9,0)")
         * _dec("l_extendedprice")).alias("val"))
    v = (li.join(F.broadcast(supp),
                 F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
         .groupBy("l_partkey")
         .agg(F.sum("val").alias("part_value")))
    total = v.agg(F.sum("part_value").cast("decimal(18,2)").alias("tot"))
    return (v.crossJoin(F.broadcast(total))
            .filter(F.col("part_value").cast("decimal(18,2)")
                    * F.lit(1000).cast("decimal(4,0)") > F.col("tot"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    F.col("part_value").cast("double").alias("part_value")))


ORACLE_IMPORTANT_PARTS = """
WITH v AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(9,0))
             * CAST(l_extendedprice AS DECIMAL(18,2))) AS part_value
  FROM lineitem
  WHERE l_suppkey IN (
      SELECT s_suppkey FROM supplier WHERE s_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')))
  GROUP BY 1)
SELECT l_partkey AS p_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM v
WHERE CAST(part_value AS DECIMAL(18,2)) * CAST(1000 AS DECIMAL(4,0))
      > (SELECT CAST(SUM(part_value) AS DECIMAL(18,2)) FROM v)
"""


# ---------------------------------------------------------------------------
# q_parts_supplier_counts — TPC-H Q16 shape: COUNT(DISTINCT supplier)
# per part attribute triple with a NOT-IN exclusion subquery (suppliers
# with negative account balance proxy Q16's complaint filter) and
# negated part predicates. The supplier-part relationship is the
# DISTINCT (l_partkey, l_suppkey) pair set from lineitem (no partsupp).
# Scale shape: the exclusion list is a broadcast ANTI join (never a
# NOT-IN nested loop); part is broadcast; one shuffle for the distinct
# agg, whose (brand, type, size) domain is tiny.
# ---------------------------------------------------------------------------

def q_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (load_table(spark, sf_dir, "part")
            .filter((F.col("p_brand") != "Brand#1")
                    & (F.col("p_type") != "PROMO")
                    & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (load_table(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey")
          .join(F.broadcast(bad),
                F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"))
    return (li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


ORACLE_PARTS_SUPPLIER_COUNTS = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q_excess_stock_suppliers — TPC-H Q20 shape: the nested-IN chain
# (supplier IN (… lineitem GROUP BY … HAVING … WHERE part IN (…))),
# decorrelated as two chained semi-joins with the HAVING threshold on a
# grouped sum. "Excess stock" = shipped more than 80 units of any
# 'small…' part. Scale shape: the part list broadcasts into a semi-join
# BEFORE the grouped agg (only matching lineitems shuffle); the
# qualifying-supplier set is a second small semi-join; nation broadcast.
# ---------------------------------------------------------------------------

def q_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    small = (load_table(spark, sf_dir, "part")
             .filter(F.col("p_name").startswith("small"))
             .select("p_partkey"))
    heavy = (load_table(spark, sf_dir, "lineitem")
             .select("l_partkey", "l_suppkey",
                     F.col("l_quantity").cast("decimal(9,0)").alias("qty"))
             .join(F.broadcast(small),
                   F.col("l_partkey") == F.col("p_partkey"), "left_semi")
             .groupBy("l_suppkey", "l_partkey")
             .agg(F.sum("qty").alias("q"))
             .filter(F.col("q") > 80)
             .select("l_suppkey").distinct())
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (load_table(spark, sf_dir, "supplier")
            .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name", "n_name"))


ORACLE_EXCESS_STOCK_SUPPLIERS = """
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE 'small%')
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(9,0))) > 80)
"""


# ---------------------------------------------------------------------------
# q_returned_item_revenue — TPC-H Q10 shape: top-20 customers by revenue
# lost to returns in a quarter (lineitem filter l_returnflag='R', orders
# date-range, customer ⋈ nation attributes). Scale shape: revenue is
# aggregated per o_custkey BEFORE the customer join (the agg-below-join
# rewrite — only |customers-with-returns| rows meet the wide customer
# table, not |lineitems|); nation broadcasts; the top-20 is a
# TakeOrdered with a deterministic (revenue DESC, custkey) total order,
# exact because revenue is a decimal sum.
# ---------------------------------------------------------------------------

def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (load_table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                      & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey",
                  (_dec("l_extendedprice")
                   * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).alias("rev")))
    per_cust = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_custkey")
                .agg(F.sum("rev").alias("revenue")))
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = (load_table(spark, sf_dir, "customer")
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "c_name", "c_acctbal", "n_name"))
    return (per_cust.join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20)
            .select("c_custkey", "c_name",
                    F.col("revenue").cast("double").alias("revenue"),
                    "c_acctbal", "n_name"))


ORACLE_RETURNED_ITEM_REVENUE = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1)
SELECT c_custkey, c_name, CAST(revenue AS DOUBLE) AS revenue, c_acctbal, n_name
FROM per_cust
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q_shipmode_priority — TPC-H Q12 shape: orders ⋈ lineitem with an
# IN-list + date-range fact filter and TWO CASE-gated counts splitting
# order priority into high/low, grouped by a low-cardinality line
# attribute. The testdata has no l_shipmode/commitdate, so the mode
# column is l_returnflag (IN ('A','R')) and the window is shipdates in
# 1997. Scale shape: the IN-list and range push into the parquet scan;
# orders contributes only (orderkey, priority) so the one shuffle join
# carries two narrow columns; the agg domain is 2 rows.
# ---------------------------------------------------------------------------

def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag").isin("A", "R")
                  & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
          .select("l_orderkey", "l_returnflag"))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count")))


ORACLE_SHIPMODE_PRIORITY = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag IN ('A', 'R')
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "shipping_priority": q_shipping_priority,
    "customers_without_orders": q_customers_without_orders,
    "order_priority_rollup": q_order_priority_rollup,
    "returns_cube": q_returns_cube,
    "top_orders_per_customer": q_top_orders_per_customer,
    "running_revenue": q_running_revenue,
    "top_expensive_orders": q_top_expensive_orders,
    "segment_distinct_customers": q_segment_distinct_customers,
    # rows-only (no ORACLES entry): HLL estimates are engine-specific;
    # rsd-bound accuracy pinned by tests/test_relational.py.
    "segment_distinct_customers_approx": q_segment_distinct_customers_approx,
    "pivot_returns": q_pivot_returns,
    "set_ops": q_set_ops,
    "scalar_functions": q_scalar_functions,
    "local_supplier_volume": q_local_supplier_volume,
    "promo_revenue": q_promo_revenue,
    "top_supplier": q_top_supplier,
    "small_qty_revenue": q_small_qty_revenue,
    "large_volume_customers": q_large_volume_customers,
    "disjunctive_revenue": q_disjunctive_revenue,
    "sales_opportunity": q_sales_opportunity,
    "summary_stats": q_summary_stats,
    "customer_distribution": q_customer_distribution,
    "waiting_suppliers": q_waiting_suppliers,
    "volume_shipping": q_volume_shipping,
    "market_share": q_market_share,
    "min_cost_supplier": q_min_cost_supplier,
    "product_profit": q_product_profit,
    "important_parts": q_important_parts,
    "parts_supplier_counts": q_parts_supplier_counts,
    "excess_stock_suppliers": q_excess_stock_suppliers,
    "returned_item_revenue": q_returned_item_revenue,
    "shipmode_priority": q_shipmode_priority,
}

ORACLES = {
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "revenue_by_nation": ORACLE_REVENUE_BY_NATION,
    "shipping_priority": ORACLE_SHIPPING_PRIORITY,
    "customers_without_orders": ORACLE_CUSTOMERS_WITHOUT_ORDERS,
    "order_priority_rollup": ORACLE_ORDER_PRIORITY_ROLLUP,
    "returns_cube": ORACLE_RETURNS_CUBE,
    "top_orders_per_customer": ORACLE_TOP_ORDERS_PER_CUSTOMER,
    "running_revenue": ORACLE_RUNNING_REVENUE,
    "top_expensive_orders": ORACLE_TOP_EXPENSIVE_ORDERS,
    "segment_distinct_customers": ORACLE_SEGMENT_DISTINCT_CUSTOMERS,
    "pivot_returns": ORACLE_PIVOT_RETURNS,
    "set_ops": ORACLE_SET_OPS,
    "scalar_functions": ORACLE_SCALAR_FUNCTIONS,
    "local_supplier_volume": ORACLE_LOCAL_SUPPLIER_VOLUME,
    "promo_revenue": ORACLE_PROMO_REVENUE,
    "top_supplier": ORACLE_TOP_SUPPLIER,
    "small_qty_revenue": ORACLE_SMALL_QTY_REVENUE,
    "large_volume_customers": ORACLE_LARGE_VOLUME_CUSTOMERS,
    "disjunctive_revenue": ORACLE_DISJUNCTIVE_REVENUE,
    "sales_opportunity": ORACLE_SALES_OPPORTUNITY,
    "summary_stats": ORACLE_SUMMARY_STATS,
    "customer_distribution": ORACLE_CUSTOMER_DISTRIBUTION,
    "waiting_suppliers": ORACLE_WAITING_SUPPLIERS,
    "volume_shipping": ORACLE_VOLUME_SHIPPING,
    "market_share": ORACLE_MARKET_SHARE,
    "min_cost_supplier": ORACLE_MIN_COST_SUPPLIER,
    "product_profit": ORACLE_PRODUCT_PROFIT,
    "important_parts": ORACLE_IMPORTANT_PARTS,
    "parts_supplier_counts": ORACLE_PARTS_SUPPLIER_COUNTS,
    "excess_stock_suppliers": ORACLE_EXCESS_STOCK_SUPPLIERS,
    "returned_item_revenue": ORACLE_RETURNED_ITEM_REVENUE,
    "shipmode_priority": ORACLE_SHIPMODE_PRIORITY,
}
