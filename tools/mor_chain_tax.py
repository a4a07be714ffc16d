"""Merge-on-read chain-length read-tax curve + auto-compaction cap.

Round-12 verdict items 3 and 8, measured: build the props-fixture
store from SF_DIR's events, land L chained edge-DELTA commits on one
graph, and time the merged single-graph props read at each chain
length — the per-read cost a delta-happy writer accumulates. Then
replay the same write sequence with ``compact_policy(max_deltas=K)``
armed and show the read cost stays at the ≤K-delta level (the policy
caps the curve). Running at sf0.1 AND the 10× ``.scale/sf1`` store
shows the merge window stays DELTA-sized as base data grows — the
design claim at engine.py's ``_edges_merged`` (the latest-wins window
runs over delta rows only), measured.

Usage: python tools/mor_chain_tax.py [SF_DIR[:K] ...]
``K`` scales the fixture's edge-key space (src mod 20·K × dst mod
30·K) so the BASE graph's stored rows actually grow with the data —
the default key space saturates at 600 rows/graph regardless of SF.
Prints one JSON line per SF_DIR.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphdatabase_spark import get_spark  # noqa: E402
from graphdatabase_spark.engine import GraphEngine  # noqa: E402

GRAPH = "click"          # one of the 5 event_type graphs
MEASURE_AT = (0, 1, 3, 6, 10)
POLICY_K = 2


def build(spark, sf_dir: str, k: int = 1) -> GraphEngine:
    """The props-fixture recipe (store_queries.py): events-derived
    edges with a string prop + vertex tags, bucketed layout; ``k``
    widens the key space so stored rows track the data volume."""
    path = os.path.join(tempfile.mkdtemp(prefix="gdb_mor_tax_"), "store")
    eng = GraphEngine(spark, path, buckets=4)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    edges = (ev.select(
        F.col("event_type").alias("graph"),
        (F.col("user_id") % (20 * k)).cast("int").alias("src"),
        (F.col("event_id") % (30 * k) + 1).cast("int").alias("dst"),
        (F.col("event_id") % 5 + 1).alias("w1"),
        F.expr("CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'a' "
               "WHEN 1 THEN 'b' ELSE 'c' END").alias("k1"))
        .groupBy("graph", "src", "dst")
        .agg(F.max("w1").cast("int").alias("w"),
             F.min("k1").alias("kind")))
    eng.append_edges(edges)
    return eng


def delta_batch(spark, i: int):
    """One small edge-delta upsert batch (10 keys) for GRAPH."""
    rows = [(GRAPH, s, (s + i) % 30 + 1, 100 + i, f"d{i}")
            for s in range(10)]
    return spark.createDataFrame(
        rows, "graph string, src int, dst int, w int, kind string")


def timed_read(eng: GraphEngine, reps: int = 3) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        eng.weighted_edges(GRAPH).count()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 4)


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".scale/sf1:10"]
    spark = get_spark("mor-chain-tax",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for spec in dirs:
        sf_dir, _, ks = spec.partition(":")
        k = int(ks) if ks else 1
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
        # --- unpoliced: the raw chain-length tax curve ---
        eng = build(spark, sf_dir, k)
        curve = {0: timed_read(eng)}
        for i in range(1, max(MEASURE_AT) + 1):
            eng.merge_edges(delta_batch(spark, i), mode="delta")
            if i in MEASURE_AT:
                curve[i] = timed_read(eng)
        base_rows = eng.weighted_edges(GRAPH).count()
        # --- policed: same 10 delta writes, policy armed ---
        eng2 = build(spark, sf_dir, k)
        eng2.compact_policy(max_deltas=POLICY_K)
        for i in range(1, max(MEASURE_AT) + 1):
            eng2.merge_edges(delta_batch(spark, i), mode="delta")
        m = eng2.manifests.load()
        dset = set(m.get("vdeltas", [])) | set(m.get("edeltas", []))
        n_deltas = sum(c in dset for c in m["graphs"][GRAPH])
        policed = timed_read(eng2)
        # equivalence of final state, policed vs not
        a = eng.snapshot().weighted_edges(GRAPH, props=True)
        b = eng2.snapshot().weighted_edges(GRAPH, props=True)
        same = a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        print(json.dumps({
            "sf_dir": sf_dir, "graph_rows": base_rows,
            "read_sec_by_chain_deltas": {str(k): v
                                         for k, v in sorted(curve.items())},
            "policy_k": POLICY_K,
            "policed_read_sec_after_10_deltas": policed,
            "policed_chain_deltas": n_deltas,
            "policed_equals_unpoliced": same,
        }), flush=True)


if __name__ == "__main__":
    main()
