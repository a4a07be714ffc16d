"""Non-iterative graph analytics: degree and triangle counting.

Degree generalizes the reference's implicit row/column scans
(``secondary_server.c:459-467``); triangle counting is the GraphX-parity
extension from SURVEY.md §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    endpoint (ties by id) before the wedge join. This bounds every
    vertex's forward-degree by O(sqrt(m)), so the wedge intermediate is
    O(m^1.5) instead of O(m * max_degree) — the difference between a
    plan that survives a skewed 100TB co-occurrence graph and one that
    doesn't. The count is orientation-invariant, so the oracle can use
    the naive a<b<c formulation.
    """
    e = edges.select("src", "dst")
    deg = (
        e.select(F.col("src").alias("vid")).unionAll(e.select(F.col("dst").alias("vid")))
        .groupBy("vid").agg(F.count(F.lit(1)).alias("deg"))
    )
    # rank = (deg, vid) lexicographic, encoded as a single orderable struct
    ranked = (
        e.join(deg.withColumnRenamed("vid", "src").withColumnRenamed("deg", "deg_src"), "src")
        .join(deg.withColumnRenamed("vid", "dst").withColumnRenamed("deg", "deg_dst"), "dst")
    )
    lower_first = (F.col("deg_src") < F.col("deg_dst")) | (
        (F.col("deg_src") == F.col("deg_dst")) & (F.col("src") < F.col("dst")))
    oriented = ranked.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
    )
    w1 = oriented.alias("e1")
    w2 = oriented.alias("e2")
    wedges = w1.join(w2, F.col("e1.v") == F.col("e2.u")).select(
        F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c"))
    # close the wedge with an edge a–c in either orientation
    closing = oriented.select(F.col("u").alias("a"), F.col("v").alias("c")).unionAll(
        oriented.select(F.col("v").alias("a"), F.col("u").alias("c")))
    tris = wedges.join(closing, ["a", "c"], "left_semi")
    return tris.agg(F.count(F.lit(1)).alias("n_triangles"))
