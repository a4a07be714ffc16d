"""Time the property-carrying BUCKETED store build at two scales —
the round-9 verdict's item 7 leg that bench.py can't see (the fixture
build is deliberately warm-up there): events-derived aggregation +
append commit with edge props + vertex-prop COW upsert, buckets=4.

Usage: python tools/props_store_scale.py [SF_DIR ...]
Prints one JSON line per SF_DIR: {sf_dir, rows_edges, build_sec}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphdatabase_spark import get_spark  # noqa: E402
from graphdatabase_spark.engine import GraphEngine  # noqa: E402


def build(spark, sf_dir: str) -> None:
    """The exact _props_fixture_engine recipe (store_queries.py),
    restated here so the BUILD itself is the timed unit."""
    path = os.path.join(tempfile.mkdtemp(prefix="gdb_props_scale_"), "store")
    eng = GraphEngine(spark, path, buckets=4)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    edges = (ev.select(
        F.col("event_type").alias("graph"),
        (F.col("user_id") % 20).cast("int").alias("src"),
        (F.col("event_id") % 30 + 1).cast("int").alias("dst"),
        (F.col("event_id") % 5 + 1).alias("w1"),
        F.expr("CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'a' "
               "WHEN 1 THEN 'b' ELSE 'c' END").alias("k1"))
        .groupBy("graph", "src", "dst")
        .agg(F.max("w1").cast("int").alias("w"),
             F.min("k1").alias("kind")))
    eng.append_edges(edges)
    verts = (edges.select("graph", F.col("src").alias("vid"))
             .unionByName(edges.select("graph", F.col("dst").alias("vid")))
             .distinct()
             .withColumn("tag", F.expr(
                 "CASE WHEN vid % 2 = 0 THEN 'even' ELSE 'odd' END")))
    eng.set_vertex_props(verts)
    return eng


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".scale/sf1"]
    spark = get_spark("props-store-scale",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in dirs:
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
        t0 = time.perf_counter()
        eng = build(spark, sf_dir)
        sec = time.perf_counter() - t0
        n = eng.weighted_edges().count()
        print(json.dumps({"sf_dir": sf_dir, "rows_edges": n,
                          "build_sec": round(sec, 3)}), flush=True)


if __name__ == "__main__":
    main()
