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
