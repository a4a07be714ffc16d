"""Non-iterative graph analytics: degree and triangle counting.

Degree generalizes the reference's implicit row/column scans
(``secondary_server.c:459-467``); triangle counting is the GraphX-parity
extension from SURVEY.md §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphdatabase_spark.cache import track_persist


def degrees(edges: DataFrame) -> DataFrame:
    """``(vid, out_degree, in_degree)`` per vertex appearing in any
    edge. Two partial aggregations + one outer join — both aggregates
    are map-side combined before their shuffle."""
    out_d = edges.groupBy(F.col("src").alias("vid")).agg(F.count(F.lit(1)).alias("out_degree"))
    in_d = edges.groupBy(F.col("dst").alias("vid")).agg(F.count(F.lit(1)).alias("in_degree"))
    return (
        out_d.join(in_d, "vid", "full_outer")
        .select(
            "vid",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Total triangle count of an undirected graph given as canonical
    ``src < dst`` edges (one row per undirected edge).

    Degree-ordered orientation ("compact-forward"): each edge is
    re-oriented from the lower-degree endpoint to the higher-degree
    endpoint (ties by id), which bounds every vertex's forward-degree
    by O(sqrt(m)). Triangles are then counted per *edge* as
    ``|N⁺(u) ∩ N⁺(v)|`` against collected forward-adjacency arrays —
    each triangle a<b<c (rank order) is found exactly once, on its
    (a, b) edge. Unlike the naive wedge self-join, the O(m·sqrt(m))
    wedge set is never materialized or shuffled: the only shuffles are
    the degree agg and the adjacency collect, both map-side combined,
    and the adjacency table (one row per vertex, ≤O(sqrt(m)) longs)
    joins back edge-side — broadcast when it fits, shuffle otherwise
    (AQE decides from runtime stats). The count is
    orientation-invariant, so the oracle can use the naive a<b<c
    formulation.
    """
    # The edge derivation can itself be a join (e.g. co-purchase); it
    # feeds the degree count, the rank join, and the adjacency collect —
    # persist it. Tracked (not raw .persist()): the consumer
    # materializes the returned 1-row aggregate after this function
    # returns, so release happens via cache.release_caches().
    e = track_persist(edges.select("src", "dst"))
    deg = (
        e.select(F.col("src").alias("vid")).unionAll(e.select(F.col("dst").alias("vid")))
        .groupBy("vid").agg(F.count(F.lit(1)).alias("deg"))
    )
    # rank = (deg, vid) lexicographic
    ranked = (
        e.join(deg.withColumnRenamed("vid", "src").withColumnRenamed("deg", "deg_src"), "src")
        .join(deg.withColumnRenamed("vid", "dst").withColumnRenamed("deg", "deg_dst"), "dst")
    )
    lower_first = (F.col("deg_src") < F.col("deg_dst")) | (
        (F.col("deg_src") == F.col("deg_dst")) & (F.col("src") < F.col("dst")))
    oriented = track_persist(ranked.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
    ))
    adj = oriented.groupBy(F.col("u").alias("vid")).agg(F.collect_set("v").alias("nbrs"))
    return (
        oriented
        .join(adj.select(F.col("vid").alias("u"), F.col("nbrs").alias("nu")), "u")
        .join(adj.select(F.col("vid").alias("v"), F.col("nbrs").alias("nv")), "v")
        .select(F.size(F.array_intersect("nu", "nv")).alias("c"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_triangles"))
    )
