"""Property tests (SURVEY.md §5): on random directed graphs, the Pregel
kernel must agree with DuckDB's recursive-CTE ground truth — BFS levels
(min hop counts) and connected components (transitive closure).

Example counts are small because each example runs real Spark jobs;
the generator is seeded per-run by hypothesis so coverage accumulates
across rounds."""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphdatabase_spark.operators import pregel
import pytest

pytestmark = pytest.mark.slow  # heavyweight integration module: full-suite tier (pyproject.toml)

MAX_N = 10


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=1, max_value=MAX_N))
    possible = [(i, j) for i in range(1, n + 1) for j in range(1, n + 1)]
    edges = draw(st.lists(st.sampled_from(possible), max_size=3 * n, unique=True))
    start = draw(st.integers(min_value=1, max_value=n))
    return n, edges, start


def _duck_bfs_levels(edges, start):
    con = duckdb.connect()
    vals = ", ".join(f"({s}, {d})" for s, d in edges) or "(NULL, NULL)"
    rows = con.execute(f"""
        WITH RECURSIVE e(src, dst) AS (SELECT * FROM (VALUES {vals}) AS t(src, dst) WHERE src IS NOT NULL),
        bfs(vid, level) AS (
          SELECT {start}, 0
          UNION
          SELECT e.dst, b.level + 1 FROM bfs b JOIN e ON e.src = b.vid
          WHERE b.level < {MAX_N + 1}
        )
        SELECT vid, MIN(level) FROM bfs GROUP BY vid
    """).fetchall()
    return dict(rows)


def _duck_components(edges, n):
    con = duckdb.connect()
    vals = ", ".join(f"({s}, {d})" for s, d in edges) or "(NULL, NULL)"
    rows = con.execute(f"""
        WITH RECURSIVE e(src, dst) AS (SELECT * FROM (VALUES {vals}) AS t(src, dst) WHERE src IS NOT NULL),
        und(src, dst) AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        verts(vid) AS (SELECT * FROM range(1, {n + 1})),
        reach(a, b) AS (
          SELECT vid, vid FROM verts
          UNION
          SELECT r.a, u.dst FROM reach r JOIN und u ON u.src = r.b
        )
        SELECT a, MIN(b) FROM reach GROUP BY a
    """).fetchall()
    return dict(rows)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(graphs())
def test_bfs_levels_match_recursive_cte(spark, g):
    n, edges, start = g
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.filter("src > 0")
    got = {r["vid"]: r["level"] for r in pregel.bfs_levels(e, [start]).collect()}
    assert got == _duck_bfs_levels(edges, start)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(graphs())
def test_connected_components_match_closure(spark, g):
    n, edges, _ = g
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.filter("src > 0")
    verts = spark.range(1, n + 1).withColumnRenamed("id", "vid")
    got = {r["vid"]: r["component"]
           for r in pregel.connected_components(e, verts).collect()}
    assert got == _duck_components(edges, n)


def _py_k_core(edges, k):
    """Literal peeling replica: repeatedly drop vertices with degree < k."""
    es = {tuple(e) for e in edges}
    while True:
        deg = {}
        for s, d in es:
            deg[s] = deg.get(s, 0) + 1
            deg[d] = deg.get(d, 0) + 1
        keep = {v for v, c in deg.items() if c >= k}
        nxt = {(s, d) for s, d in es if s in keep and d in keep}
        if nxt == es:
            break
        es = nxt
    out = {}
    for s, d in es:
        out[s] = out.get(s, 0) + 1
        out[d] = out.get(d, 0) + 1
    return out


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(graphs(), st.integers(min_value=1, max_value=4))
def test_k_core_matches_python_peeling(spark, g, k):
    from graphdatabase_spark.operators import graph_algos
    _, edges, _ = g
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.filter("src > 0")
    got = {r["vid"]: r["core_deg"] for r in graph_algos.k_core(e, k).collect()}
    assert got == _py_k_core(edges, k)


def _py_asof(left, right):
    """Brute-force as-of: latest right (ts, payload) with ts <= l.ts per key."""
    out = []
    for lk, lts in left:
        best = None
        for rk, rts, p in right:
            if rk == lk and rts <= lts and (best is None or rts > best[0]):
                best = (rts, p)
        out.append((lk, lts, None if best is None else best[1]))
    return sorted(out)


@st.composite
def asof_inputs(draw):
    keys = st.integers(min_value=1, max_value=3)
    ts = st.integers(min_value=0, max_value=20)
    left = draw(st.lists(st.tuples(keys, ts), min_size=1, max_size=8, unique=True))
    right = draw(st.lists(st.tuples(keys, ts), min_size=0, max_size=8, unique=True))
    return left, [(k, t, k * 100 + t) for k, t in right]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(asof_inputs())
def test_asof_join_matches_bruteforce(spark, inp):
    from pyspark.sql import functions as F

    from graphdatabase_spark.operators.temporal import asof_join
    left_rows, right_rows = inp
    left = spark.createDataFrame(
        [(k, float(t)) for k, t in left_rows], "k long, ts double") \
        .select("k", F.timestamp_seconds("ts").alias("ts"))
    right = spark.createDataFrame(
        [(k, float(t), p) for k, t, p in right_rows] or [(0, 0.0, 0)],
        "k long, ts double, payload long")
    if not right_rows:
        right = right.filter("k > 0")
    right = right.select("k", F.timestamp_seconds("ts").alias("ts"), "payload")
    res = asof_join(left, right, key="k", ts="ts", payload_cols=["payload"])
    got = sorted((r["k"], r["ts"].timestamp(), r["payload_asof"])
                 for r in res.collect())
    want = [(k, float(t), p) for (k, t, p) in _py_asof(left_rows, right_rows)]
    assert got == want
