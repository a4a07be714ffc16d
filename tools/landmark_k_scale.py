"""shortest_paths(landmarks) k-factor scaling, measured (round-10
verdict item 6).

The landmark kernel packs the landmark into the grouping key and
replicates the (reversed) edge set k× via a broadcast join
(engine.shortest_paths) — k landmarks = k independent traversals in ONE
grouped superstep loop, at k× the per-superstep join width. That k
factor was a docstring; this tool makes it a number: isolated runs
(fresh JVM per leg, standard warm-up, props fixture store pre-built
untimed) of k=2 vs k=8 at sf0.1 and sf1 (tools/make_scale.py 10×
scale-up). Results are merged into BENCH_SF1.json by the caller.

Usage::

    python tools/landmark_k_scale.py                # all four legs
    python tools/landmark_k_scale.py --leg SF_DIR K # one leg (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scale", "sf1")


def run_leg(sf_dir: str, k: int) -> None:
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    import bench  # noqa: E402  (repo-root module)
    from graphdatabase_spark import get_spark
    from graphdatabase_spark.operators import store_queries as sq

    spark = get_spark("landmark-k-scale",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    bench.SF_DIR = sf_dir
    for t in bench.WARMUP_TABLES:
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    bench._warm_engine(spark)
    eng = sq._props_fixture_engine(spark, sf_dir)  # untimed fixture build
    landmarks = list(range(1, k + 1))
    t0 = time.perf_counter()
    n = len(eng.shortest_paths(landmarks, max_hops=40).collect())
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    n2 = len(eng.shortest_paths(landmarks, max_hops=40).collect())
    warm = time.perf_counter() - t0
    assert n == n2
    print(json.dumps({"sf_dir": sf_dir, "k": k, "rows": n,
                      "cold_sec": round(cold, 3),
                      "warm_sec": round(warm, 3)}))


def main() -> None:
    out = {}
    for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        for k in (2, 8):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg",
                 sf_dir, str(k)],
                capture_output=True, text=True, check=True)
            doc = json.loads(r.stdout.strip().splitlines()[-1])
            out[f"{sf_name}_k{k}"] = doc
            print(json.dumps(doc), flush=True)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--leg":
        run_leg(sys.argv[2], int(sys.argv[3]))
    else:
        main()
