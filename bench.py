"""Per-round benchmark: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric", "value" (total sec), "unit", "queries": {id: sec},
"sf"}.

Timing = full wall-clock per query including plan build and collect to
the driver (what a user of the engine experiences). One warm-up action
runs first so JVM/codegen startup is not charged to the first query.

Committed sweeps are MEDIANS: the full sweep runs ``--repeat N`` times
(default 3, env SPARK_GRAFT_BENCH_REPEAT) with the shared operator
caches released between sweeps, and every per-query figure is the
median across completed sweeps. Single-run sweeps on this host swing
2-12x on individual queries (three rounds of outlier triage concluded
"host noise" every time — BENCH_ISO_r0{4,5}.json); the median absorbs
a one-off swing without a manual isolated cross-check. The JSON line
is (re)printed after EVERY completed sweep — consumers that parse the
tail of the output get medians of however many sweeps finished, so a
timeout degrades to fewer sweeps instead of no result. BENCH_FULL.json
additionally records each sweep's raw totals (``sweep_totals``) so
median-of-3 rounds stay comparable to older single-sweep rounds.

Regression triage mode: ``bench.py --isolate id1,id2,...`` runs each
query in a FRESH subprocess (own JVM) with the standard table warm-up,
timing one cold execution and one immediately-following warm execution
— removing cross-query cache/JIT/GC interference so a full-sweep
timing swing can be attributed (real regression vs shared-session
noise). Prints one JSON line with per-query {cold_sec, warm_sec, rows}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

WARMUP_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")


def _sf_num() -> float | str:
    sf = os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf")
    try:
        return float(sf)
    except ValueError:
        return sf


def _warm_engine(spark) -> None:
    """One-time JVM/codegen warm-up beyond the table scans: exercise
    the join, window, and hash-agg machinery on a tiny synthetic input
    so the first *timed* query isn't charged for first-use JIT and
    plan-machinery init (measured ~7 s on the suite's alphabetically
    first query at sf0.1, independent of which query it is)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") % 3).alias("j"))
    w = Window.partitionBy("k").orderBy("id")
    (df.join(df.groupBy("k").agg(F.sum("id").alias("s")), "k")
       .withColumn("rn", F.row_number().over(w))
       .groupBy("j").agg(F.count(F.lit(1)), F.max("rn"), F.avg("s"))
       .collect())


# Session-shared HARNESS FIXTURES, mapped to the query ids that read
# them: built once per process and reused by every consumer, so their
# one-time construction is warm-up, not query work (round-9 verdict
# items 3 and 8 — the iso harness was measuring fixture-store builds
# for store_* ids, and bfs_levels' sweep slot carried the derived-edge
# materialization). Queries that build a FRESH store per call by
# design (store_stream_ingest, store_sql_dml) are absent: there the
# commit protocol IS the measured work.
_FIXTURE_STORE_IDS = frozenset({
    "store_stats", "store_bfs_all", "store_cc_all", "store_scc_all",
    "store_sssp_all", "store_pagerank_all", "store_sql_degree",
    "motif_find", "store_triangle_all"})
_MERGE_STORE_IDS = frozenset({"store_merge_edges", "store_snapshot_diff"})
_PROPS_STORE_IDS = frozenset({"motif_weighted", "bfs_expr",
                              "shortest_paths_landmarks",
                              "pregel_max_prop"})
_DERIVED_EDGE_IDS = frozenset({
    "bfs_levels", "reachability", "shortest_path_hops", "kcore",
    "graph_degree", "sssp_weighted", "dfs_leaves_tree", "graph_stats"})
# Round-15 (optimization round): the two fixture stores added in
# rounds 14-15 join the same warm-up policy as the three above — the
# committed-quantizer ANN store (read by the stored-serving ids) and
# the commit-chain tailing store (read by store_stream_source). Both
# are session-shared harness fixtures whose one-time build was being
# charged to whichever query hit them first each sweep (16.3 s /
# 17.0 s in-sweep vs 0.8 s / 4.5 s warm-iso, BENCH_FULL.json at
# ab7adb7 — kept in OPTIMIZATION_r15.md as the old numbers). Queries
# that build a FRESH store per call by design (store_stream_ingest,
# store_sql_dml, store_sql_maintenance) remain fully charged.
_ANN_STORE_IDS = frozenset({
    "embedding_ivf_stored_topk", "embedding_pq_stored_topk",
    "embedding_ivfpq_topk"})
_TAIL_STORE_IDS = frozenset({"store_stream_source"})


def _warm_shared(spark, qid: str | None = None) -> None:
    """Pre-build the session-shared fixtures ``qid`` reads (all of
    them for the full sweep, ``qid=None``), untimed. On-disk fixture
    stores persist for the whole process; the derived-edge persist is
    dropped by ``registry.release()`` between sweeps, so the sweep
    loop re-warms it."""
    from graphdatabase_spark.operators import derived_graph as dg
    from graphdatabase_spark.operators import store_queries as sq

    if qid is None or qid in _DERIVED_EDGE_IDS:
        dg.full_edges_prepared(spark, SF_DIR).count()
    if qid is None or qid in _FIXTURE_STORE_IDS:
        sq.fixture_engine(spark)
    if qid is None or qid in _MERGE_STORE_IDS:
        sq._merge_fixture_engine(spark, SF_DIR)
    if qid is None or qid in _PROPS_STORE_IDS:
        sq._props_fixture_engine(spark, SF_DIR)
    if qid is None or qid in _ANN_STORE_IDS:
        sq._ann_store_engine(spark, SF_DIR)
    if qid is None or qid in _TAIL_STORE_IDS:
        sq._tail_store_engine(spark, SF_DIR)


def run_single(qid: str) -> None:
    """One query in this (fresh) process: warm-up scans + the shared
    fixtures the query reads, then a cold and a warm timed execution.
    Prints one JSON line."""
    from graphdatabase_spark import get_spark, registry

    spark = get_spark("graphdatabase-spark-bench-iso",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for t in WARMUP_TABLES:
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
    _warm_engine(spark)
    _warm_shared(spark, qid)
    fn = registry.queries()[qid]
    t0 = time.perf_counter()
    rows = fn(spark, SF_DIR).collect()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows = fn(spark, SF_DIR).collect()
    warm = time.perf_counter() - t0
    print(json.dumps({"query": qid, "cold_sec": round(cold, 4),
                      "warm_sec": round(warm, 4), "rows": len(rows)}))


def _isolated_timings(ids: list[str], per_query_timeout: int = 600
                      ) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for qid in ids:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single", qid],
                capture_output=True, text=True, timeout=per_query_timeout)
        except subprocess.TimeoutExpired:
            # One hung query must not abort the sweep and discard the
            # timings already collected — record it and move on.
            out[qid] = {"error": f"timeout after {per_query_timeout}s"}
            print(f"# isolated {qid}: TIMEOUT", file=sys.stderr)
            continue
        parsed = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                parsed = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        if parsed is None:
            parsed = {"query": qid, "error": (proc.stderr or "no output")[-500:]}
        out[qid] = {k: v for k, v in parsed.items() if k != "query"}
        print(f"# isolated {qid}: {out[qid]}", file=sys.stderr)
    return out


def run_isolated(ids: list[str]) -> None:
    out = _isolated_timings(ids)
    print(json.dumps({"metric": "isolated_query_wall_seconds",
                      "unit": "sec", "sf": _sf_num(), "queries": out},
                     sort_keys=True))


def _emit(medians: dict[str, float], sweep_totals: list[float],
          repeat: int, iso_top: dict | None = None) -> None:
    """Write BENCH_FULL.json and print the budgeted one-line JSON for
    the current median state. Called after every completed sweep so a
    killed run still leaves the latest completed medians in the output
    tail and on disk."""
    full = {
        "metric": "total_query_wall_seconds",
        "value": round(sum(medians.values()), 4),
        "unit": "sec",
        "n_queries": len(medians),
        "queries": medians,
        "sf": _sf_num(),
        "sweeps_completed": len(sweep_totals),
        "repeat": repeat,
        "sweep_totals": [round(t, 4) for t in sweep_totals],
    }
    if iso_top is not None:
        # isolated-warm figures for the slowest ids: stable numbers a
        # future regression flag can start from (sweep medians on this
        # host still swing; the isolated warm run is the ground truth)
        full["iso_top"] = iso_top
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_FULL.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)

    # The driver keeps only the last ~2000 chars of output and parses the
    # JSON line from that window (BENCH_r02 failed to parse because the
    # full 87-query map pushed the line past 2000 chars).  Keep the
    # stdout line under budget by including the slowest queries until
    # ~1600 bytes (slack for any stderr noise sharing the tail window),
    # summarizing the rest.
    budget = 1600
    shown: dict[str, float] = {}
    line = ""
    for name in sorted(medians, key=medians.get, reverse=True):
        trial = dict(shown)
        trial[name] = round(medians[name], 2)
        cand = json.dumps({**full, "queries": trial,
                           "queries_omitted": len(medians) - len(trial)},
                          separators=(",", ":"))
        if len(cand) > budget:
            break
        shown, line = trial, cand
    print(line, flush=True)


def main(repeat: int) -> None:
    import statistics

    from graphdatabase_spark import get_spark, registry

    # No console progress bars: the driver parses the result JSON from
    # the last ~2000 chars of combined output, so keep stderr quiet.
    spark = get_spark("graphdatabase-spark-bench",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM, codegen, and parquet footer caches for every
    # table a first-in-sort-order query would otherwise be charged for
    # (same list as the isolated mode, so the two stay comparable).
    for t in WARMUP_TABLES:
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
    _warm_engine(spark)

    sweeps: list[dict[str, float]] = []
    for s in range(repeat):
        # re-warm per sweep: release() below drops the derived-edge
        # persist, and its rebuild is harness fixture cost, not the
        # first consumer's query cost
        _warm_shared(spark)
        timings: dict[str, float] = {}
        for name, fn in sorted(registry.queries().items()):
            t0 = time.perf_counter()
            rows = fn(spark, SF_DIR).collect()
            timings[name] = round(time.perf_counter() - t0, 4)
            print(f"# [{s + 1}/{repeat}] {name}: {timings[name]:.3f}s "
                  f"({len(rows)} rows)", file=sys.stderr)
        # Free the session-shared operator caches (shingle index, LSH
        # buckets, …) so every sweep — and any back-to-back bench run
        # in one process — starts cold with respect to them.
        registry.release()
        sweeps.append(timings)
        medians = {name: round(statistics.median(sw[name] for sw in sweeps), 4)
                   for name in timings}
        _emit(medians, [sum(sw.values()) for sw in sweeps], repeat)

    # After the final sweep: isolated cold+warm runs (fresh JVM each)
    # for the N slowest ids, folded into the same artifact — in-sweep
    # medians on this host swing 2-12x on individual queries, so the
    # isolated-warm figure is the stable baseline future rounds diff
    # against. Emitted LAST: if the run is killed mid-phase, the plain
    # medians line above already stands.
    n_iso = int(os.environ.get("SPARK_GRAFT_BENCH_ISO_TOP", "10"))
    if n_iso > 0:
        top = sorted(medians, key=medians.get, reverse=True)[:n_iso]
        # stop THIS process's JVM first: a resident local[32] heap
        # competing with each subprocess inflates and even INVERTS the
        # cold/warm pair (round 10 measured store_cc_all warm 15.5 s >
        # cold 9.2 s under the live parent vs 4.3/7.7 standalone)
        spark.stop()
        iso = _isolated_timings(top, per_query_timeout=240)
        iso_top = {q: ({"cold": d["cold_sec"], "warm": d["warm_sec"]}
                       if "warm_sec" in d else d)
                   for q, d in iso.items()}
        _emit(medians, [sum(sw.values()) for sw in sweeps], repeat, iso_top)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--single":
        run_single(sys.argv[2])
    elif len(sys.argv) >= 3 and sys.argv[1] == "--isolate":
        run_isolated([q for arg in sys.argv[2:] for q in arg.split(",") if q])
    elif len(sys.argv) >= 3 and sys.argv[1] == "--repeat":
        main(max(1, int(sys.argv[2])))
    else:
        main(max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))))
