"""Per-query Spark JOB count census: run every registered query once
(warm fixtures, same prep as bench.py) and record how many Spark jobs
each query's build+collect issues, plus wall seconds.

Job count is a NOISE-FREE proxy for driver round trips: every eager
action (count, collect, checkpoint, persist materialization, write)
is one job, and at 100 TB each job is a scheduling + stage barrier.
Queries with unexpectedly many jobs either loop on the driver
(iterative kernels — expected) or hide eager actions worth removing.

Usage: python tools/job_census.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(out_path: str | None) -> None:
    import bench
    from graphdatabase_spark import get_spark, registry

    spark = get_spark("job-census",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for t in bench.WARMUP_TABLES:
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
    bench._warm_engine(spark)
    bench._warm_shared(spark)

    out: dict[str, dict] = {}
    for name, fn in sorted(registry.queries().items()):
        sc.setJobGroup(f"census:{name}", name)
        t0 = time.perf_counter()
        rows = fn(spark, SF_DIR).collect()
        dt = time.perf_counter() - t0
        jobs = tracker.getJobIdsForGroup(f"census:{name}")
        out[name] = {"jobs": len(jobs), "sec": round(dt, 3),
                     "rows": len(rows)}
        print(f"# {name}: jobs={len(jobs)} sec={dt:.2f}", file=sys.stderr,
              flush=True)
    doc = {"what": "per-query Spark job counts (one warm sweep)",
           "sf": os.path.basename(SF_DIR), "queries": out}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps({k: v["jobs"] for k, v in
                      sorted(out.items(), key=lambda kv: -kv[1]["jobs"])}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
