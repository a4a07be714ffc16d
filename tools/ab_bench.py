"""Targeted A/B timing for the optimization rounds: run a subset of
registered queries with bench.py's exact methodology (same warm-up,
same collect-to-driver timing, shared caches released between sweeps)
plus optional extra Spark confs, in ONE process.

Usage:
  python tools/ab_bench.py id1,id2,...       [--sweeps N]
  SPARK_GRAFT_AB_CONF="spark.x=y;spark.a=b" python tools/ab_bench.py ids

Prints one JSON line {"queries": {id: median_sec}, "total": sec,
"conf": {...}} — NOT a driver artifact, a local comparison tool.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(ids: list[str], sweeps: int, raw: bool = False) -> None:
    import bench
    from graphdatabase_spark import get_spark, registry

    conf = {"spark.ui.showConsoleProgress": "false"}
    for kv in os.environ.get("SPARK_GRAFT_AB_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            conf[k.strip()] = v.strip()
    spark = get_spark("ab-bench", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    for t in bench.WARMUP_TABLES:
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
    bench._warm_engine(spark)

    qs = registry.queries()
    unknown = [q for q in ids if q not in qs]
    if unknown:
        raise SystemExit(f"unknown ids: {unknown}")
    runs: list[dict[str, float]] = []
    for s in range(sweeps):
        for qid in ids:
            bench._warm_shared(spark, qid)
        timings: dict[str, float] = {}
        for qid in ids:
            spark.sparkContext.setJobDescription(f"ab:{qid}")
            t0 = time.perf_counter()
            rows = qs[qid](spark, SF_DIR).collect()
            timings[qid] = round(time.perf_counter() - t0, 4)
            print(f"# [{s+1}/{sweeps}] {qid}: {timings[qid]:.3f}s "
                  f"({len(rows)} rows)", file=sys.stderr, flush=True)
        registry.release()
        runs.append(timings)
    med = {q: round(statistics.median(r[q] for r in runs), 4) for q in ids}
    out = {"queries": med, "total": round(sum(med.values()), 4),
           "sweeps": sweeps,
           "conf": {k: v for k, v in conf.items()
                    if k != "spark.ui.showConsoleProgress"}}
    if raw:
        # every sweep's raw value per query — for interleaved A/B
        # (tools/ab_interleaved.py) which medians ACROSS invocations
        out["raw"] = {q: [r[q] for r in runs] for q in ids}
    print(json.dumps(out))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    sweeps = 2
    raw = "--raw" in args
    if raw:
        args.remove("--raw")
    if "--sweeps" in args:
        i = args.index("--sweeps")
        sweeps = int(args[i + 1])
        del args[i:i + 2]
    main([q for a in args for q in a.split(",") if q], sweeps, raw)
