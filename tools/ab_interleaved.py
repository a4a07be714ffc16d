"""INTERLEAVED A/B for Spark-conf experiments (round-16, VERDICT item
2): alternate fresh-JVM ab_bench.py invocations with and without a
candidate conf set — A, B, A, B, ... — so slow host-load drift hits
both sides equally instead of whichever side ran second (the round-15
lesson: back-to-back sweeps differed 2.7x with ZERO code change).

Usage:
  python tools/ab_interleaved.py "spark.x=y;spark.a=b" id1,id2,... \
      [--rounds N] [--sweeps M]

Per side: N subprocess invocations (cold JVM each), M in-process
sweeps per invocation; per-query figure = median over all N*M sweeps
of that side. Prints one JSON line with per-query A/B medians, the
ratio (A=baseline / B=candidate; >1 means the candidate is faster),
and the geomean ratio.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(conf: str, ids: str, sweeps: int) -> dict[str, list[float]]:
    env = dict(os.environ)
    if conf:
        env["SPARK_GRAFT_AB_CONF"] = conf
    else:
        env.pop("SPARK_GRAFT_AB_CONF", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ab_bench.py"),
         ids, "--sweeps", str(sweeps), "--raw"],
        capture_output=True, text=True, env=env, timeout=1800)
    line = None
    for ln in reversed(proc.stdout.strip().splitlines()):
        try:
            line = json.loads(ln)
            break
        except json.JSONDecodeError:
            continue
    if line is None:
        raise RuntimeError(f"ab_bench produced no JSON: "
                           f"{(proc.stderr or '')[-500:]}")
    return line["raw"]


def main() -> None:
    args = sys.argv[1:]
    rounds, sweeps = 4, 2
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i:i + 2]
    if "--sweeps" in args:
        i = args.index("--sweeps")
        sweeps = int(args[i + 1])
        del args[i:i + 2]
    conf, ids = args[0], args[1]
    id_list = [q for q in ids.split(",") if q]
    a_raw: dict[str, list[float]] = {q: [] for q in id_list}
    b_raw: dict[str, list[float]] = {q: [] for q in id_list}
    for r in range(rounds):
        # A (baseline) and B (candidate) alternate within every round
        for side, conf_s, acc in (("A", "", a_raw), ("B", conf, b_raw)):
            raw = _run(conf_s, ids, sweeps)
            for q in id_list:
                acc[q].extend(raw[q])
            print(f"# round {r + 1}/{rounds} side {side}: "
                  f"{ {q: [round(x, 2) for x in raw[q]] for q in id_list} }",
                  file=sys.stderr, flush=True)
    a_med = {q: statistics.median(a_raw[q]) for q in id_list}
    b_med = {q: statistics.median(b_raw[q]) for q in id_list}
    ratio = {q: round(a_med[q] / b_med[q], 3) if b_med[q] else None
             for q in id_list}
    geo = math.exp(sum(math.log(r) for r in ratio.values() if r)
                   / max(1, len([r for r in ratio.values() if r])))
    print(json.dumps({
        "conf": conf, "rounds": rounds, "sweeps_per_round": sweeps,
        "a_median": {q: round(v, 3) for q, v in a_med.items()},
        "b_median": {q: round(v, 3) for q, v in b_med.items()},
        "speedup_b_over_a": ratio,
        "geomean_speedup": round(geo, 4),
        "a_total": round(sum(a_med.values()), 3),
        "b_total": round(sum(b_med.values()), 3),
    }))


if __name__ == "__main__":
    main()
