"""Driver-session robustness: every query family must run under a
PLAIN SparkSession (none of the engine's session.py confs).

The correctness driver builds its own vanilla session, so anything that
only works under ``get_spark()`` is invisible to our tests but red in
CORRECTNESS_r{N}. Round 1 lost 8 queries to exactly this (events
TIMESTAMP(NANOS) handling tied to a session conf); round 3 found 15
more latent failures when pyspark 4.1 changed the nanos read path.

A plain session can't coexist with the engine session in one JVM
(session confs differ), so this test runs in a subprocess.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One representative per family that touches a distinct read/typing
# path: events (ntz timestamps), temporal joins, stateful batch form,
# multimodal binary, embeddings arrays, text, relational decimal, graph.
SAMPLE = [
    "events_tumbling_counts",
    "events_sessionization",
    "asof_join_events",
    "running_user_stats",
    "multimodal_features",
    "embedding_cosine_topk",
    "quality_score",
    "pricing_summary",
    "bfs_levels",
]

_SCRIPT = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

builder = (SparkSession.builder.master("local[8]")
           .appName("plain-session-test"))
for kv in {extra_conf!r}.items():
    builder = builder.config(*kv)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry
qs = entry.queries()
out = {{}}
for name in {sample!r}:
    try:
        out[name] = len(qs[name](spark, {sf_dir!r}).collect())
    except Exception as e:  # noqa: BLE001
        out[name] = f"{{type(e).__name__}}: {{e}}"[:300]
from graphdatabase_spark.streaming.streamops import events_batch
out["__min_ts"] = str(events_batch(spark, {sf_dir!r}).agg({{"ts": "min"}}).collect()[0][0])
print("RESULT::" + json.dumps(out))
"""


def _run_plain(sf_dir, sample, extra_conf=None):
    script = _SCRIPT.format(repo=REPO, sample=sample, sf_dir=sf_dir,
                            extra_conf=extra_conf or {})
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, f"subprocess died:\n{proc.stderr[-2000:]}"
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT::")), None)
    assert line, f"no result line in:\n{proc.stdout[-2000:]}"
    return json.loads(line.removeprefix("RESULT::"))


def test_queries_run_under_plain_session(sf_dir):
    results = _run_plain(sf_dir, SAMPLE)
    min_ts = results.pop("__min_ts")
    failures = {k: v for k, v in results.items() if not isinstance(v, int)}
    assert not failures, f"queries failed under a plain session: {failures}"
    assert all(v > 0 for v in results.values()), results
    assert min_ts == _expected_min_ts(sf_dir), min_ts


def _expected_min_ts(sf_dir):
    import duckdb

    (v,) = duckdb.sql(
        "SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') "
        f"FROM read_parquet('{sf_dir}/events.parquet')").fetchone()
    return v


def test_events_run_under_ltz_session(sf_dir):
    """With NTZ inference disabled the events ts column reads as
    TIMESTAMP_LTZ — the third dtype branch of _with_event_ts. The
    session timezone is deliberately NON-UTC: recovering the stored UTC
    wall clock must not depend on it (a session-tz cast would shift
    every event by the offset and silently break oracle parity)."""
    results = _run_plain(
        sf_dir,
        ["events_tumbling_counts", "asof_join_events", "sql_forecast_revenue"],
        extra_conf={"spark.sql.parquet.inferTimestampNTZ.enabled": "false",
                    "spark.sql.session.timeZone": "Asia/Kolkata"})
    min_ts = results.pop("__min_ts")
    failures = {k: v for k, v in results.items() if not isinstance(v, int)}
    assert not failures, f"queries failed under an LTZ session: {failures}"
    assert all(v > 0 for v in results.values()), results
    assert min_ts == _expected_min_ts(sf_dir), (
        f"canonical ts drifted under non-UTC LTZ session: {min_ts}")
