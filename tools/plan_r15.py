"""Capture per-query ``explain("formatted")`` snapshots for the
round-15 optimization evidence (plans/r15/<query>_{before,after}.txt).

Usage: python tools/plan_r15.py <before|after> id1,id2,...

Each file holds the formatted physical plan of the query's declared
DataFrame at $SPARK_GRAFT_SF_DIR (default sf0.1) — the artifact the
optimization judge diffs against OPTIMIZATION_r15.md's plan claims.
Queries whose builders execute eagerly (fixture stores, availableNow
streams) still produce the plan of the RETURNED DataFrame, which is
the surface the bench times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", "r15")


def main(tag: str, ids: list[str]) -> None:
    from graphdatabase_spark import get_spark, registry

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-r15",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    unknown = [q for q in ids if q not in qs]
    if unknown:
        raise SystemExit(f"unknown query ids: {unknown}")
    for qid in ids:
        df = qs[qid](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{qid}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {qid} @ {SF_DIR} ({tag})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], [q for arg in sys.argv[2:] for q in arg.split(",") if q])
