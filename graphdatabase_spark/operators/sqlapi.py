"""SQL-text interface: the engine's tables as temp views + queries
expressed as SQL strings through ``spark.sql`` (same Catalyst plans as
the DataFrame API — this module exists to prove the SQL surface works
end to end, reference has no SQL at all, SURVEY.md §2.3).

Also home of the skew-salted join: the deterministic-salt pattern for
keys hot enough that AQE's skew splitting isn't enough. Semantics are
identical to the plain equi-join (the oracle *is* the plain join);
only the physical distribution changes — the hot key's rows spread
over ``SALT`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabase_spark.operators.derived_graph import COMMUNITY_EDGES_CTE
from graphdatabase_spark.sources.tables import TABLE_NAMES, load_table


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLE_NAMES) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# TPC-H Q6-shaped forecast-revenue query, written as SQL text. Decimal
# accumulation for cross-engine exactness (relational.py convention).
SQL_FORECAST_REVENUE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= '1997-01-01 00:00:00'
  AND l_shipdate <  '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(SQL_FORECAST_REVENUE)


# The oracle is the *same SQL text* modulo the timestamp-literal
# dialect — by construction, because spark.sql and DuckDB both speak
# ANSI over identical views.
ORACLE_SQL_FORECAST_REVENUE = SQL_FORECAST_REVENUE


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt: int = 16) -> DataFrame:
    """Inner equi-join on ``key`` with the left side's rows spread over
    ``salt`` sub-keys and the right side replicated ``salt``× — the
    classic fix when one key holds so many rows that a single reducer
    (even after AQE skew splitting) becomes the stage's tail.

    The left salt round-robins rows within each input partition
    (monotonically_increasing_id mod salt), NOT a content hash: a hot
    key's rows are often near-identical after projection, and a
    content-derived salt would send all duplicates to the same reducer
    — keeping exactly the skew this exists to break. The salt only
    chooses physical placement, so the result set is EXACTLY the plain
    join's (the oracle states it as one) regardless of partition
    layout.
    """
    lsalt = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"))
    rsalt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return lsalt.join(rsalt, [key, "__salt"]).drop("__salt")


def q_salted_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through the salted join (orders ⋈
    lineitem on the fact key), proving salting preserves semantics."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(18,2)")
         * F.col("l_discount").cast("decimal(18,2)")).alias("disc"))
    joined = salted_join(li, orders, "l_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("disc").cast("double").alias("disc_revenue"))


ORACLE_SALTED_JOIN_ORDERS = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc_revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# Explicit GROUPING SETS (beyond rollup/cube): disjoint custom set list
# in one pass — same expand-then-aggregate plan family, stated as SQL
# text because the DataFrame API only exposes rollup/cube directly.
SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(SQL_GROUPING_SETS)


ORACLE_SQL_GROUPING_SETS = SQL_GROUPING_SETS


# Window-function breadth in one pass: ranking (ntile, percent_rank,
# cume_dist) + value windows (first/last over a running frame) — the
# families top_orders_per_customer/running_revenue don't cover. All
# int-or-exact-fraction outputs: percent_rank/cume_dist are single
# divisions of identical ints in both engines.
SQL_WINDOW_SHOWCASE = """
SELECT o_orderkey, o_orderpriority,
       NTILE(4)       OVER w AS price_quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST()    OVER w AS cume,
       FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
       LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice ASC, o_orderkey ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                               AS priciest_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


def q_window_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(SQL_WINDOW_SHOWCASE)


ORACLE_WINDOW_SHOWCASE = SQL_WINDOW_SHOWCASE


# Native SQL recursion (WITH RECURSIVE landed in Spark 4.0): min-hop
# levels over the derived community graph from region 0 — the SQL-text
# counterpart of the Pregel BFS kernel, and the exact construction
# every graph ORACLE in this repo uses DuckDB-side. Running the SAME
# text through spark.sql proves the recursion surface itself, not just
# the DataFrame loop. The hop bound (< 4; the graph is a depth-2 tree)
# is the standard recursive-CTE termination guard. Scale note: SQL
# recursion re-unions the full frontier per step with no
# localCheckpoint, so the iterative Pregel kernels remain the 100 TB
# path; this entry exists for surface parity and small/medium graphs.
SQL_RECURSIVE_REACHABILITY = f"""
WITH RECURSIVE {COMMUNITY_EDGES_CTE.strip()},
reach(vid, lvl) AS (
  SELECT CAST(0 AS BIGINT) AS vid, 0 AS lvl
  UNION ALL
  SELECT e.dst, r.lvl + 1
  FROM reach r JOIN graph_edges e ON e.src = r.vid
  WHERE r.lvl < 4
)
SELECT vid, CAST(MIN(lvl) AS INT) AS level FROM reach GROUP BY vid
"""


def q_sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(SQL_RECURSIVE_REACHABILITY)


ORACLE_SQL_RECURSIVE_REACHABILITY = SQL_RECURSIVE_REACHABILITY


QUERIES = {
    "sql_forecast_revenue": q_sql_forecast_revenue,
    "salted_join_orders": q_salted_join_orders,
    "sql_grouping_sets": q_sql_grouping_sets,
    "window_showcase": q_window_showcase,
    "sql_recursive_reachability": q_sql_recursive_reachability,
}

ORACLES = {
    "sql_forecast_revenue": ORACLE_SQL_FORECAST_REVENUE,
    "salted_join_orders": ORACLE_SALTED_JOIN_ORDERS,
    "sql_grouping_sets": ORACLE_SQL_GROUPING_SETS,
    "window_showcase": ORACLE_WINDOW_SHOWCASE,
    "sql_recursive_reachability": ORACLE_SQL_RECURSIVE_REACHABILITY,
}
