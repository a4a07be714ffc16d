"""Motif/pattern matching (operators/motif.py, GraphFrames ``find``
surface): hand-checkable patterns on tiny graphs, per-graph isolation
over the multi-graph edge table, the error contract, and brute-force
parity on a seeded random digraph (the strongest check: every binding
the DataFrame join plan produces must equal a python enumeration)."""

import itertools
import random

import pytest

from graphdatabase_spark.engine import GraphEngine
from graphdatabase_spark.operators.motif import find


def _edges(spark, rows):
    return spark.createDataFrame(rows, "graph string, src int, dst int")


def _rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_two_hop_and_triangle(spark):
    e = _edges(spark, [("g", 1, 2), ("g", 2, 3), ("g", 3, 1), ("g", 2, 4)])
    two_hop = find(e, "(a)-[]->(b); (b)-[]->(c)")
    assert _rows(two_hop, "a", "b", "c") == {
        (1, 2, 3), (1, 2, 4), (2, 3, 1), (3, 1, 2)}
    tri = find(e, "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)")
    assert _rows(tri, "a", "b", "c") == {(1, 2, 3), (2, 3, 1), (3, 1, 2)}


def test_negation_open_wedges(spark):
    # 1→2→3 with the closing edge 1→3 present; 1→2→4 stays open
    e = _edges(spark, [("g", 1, 2), ("g", 2, 3), ("g", 1, 3), ("g", 2, 4)])
    open_wedge = find(e, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
    got = _rows(open_wedge, "a", "b", "c")
    assert (1, 2, 3) not in got
    assert (1, 2, 4) in got


def test_named_edges_and_anonymous_vertices(spark):
    e = _edges(spark, [("g", 1, 2), ("g", 2, 3)])
    out = find(e, "(a)-[e1]->(b); (b)-[e2]->()")
    row = out.filter("a = 1").collect()[0]
    assert (row["e1"]["src"], row["e1"]["dst"]) == (1, 2)
    assert (row["e2"]["src"], row["e2"]["dst"]) == (2, 3)
    assert "c" not in out.columns  # the anonymous vertex is not output


def test_matches_never_cross_graphs(spark):
    e = _edges(spark, [("g1", 1, 2), ("g2", 2, 3)])
    assert find(e, "(a)-[]->(b); (b)-[]->(c)").count() == 0
    e2 = _edges(spark, [("g1", 1, 2), ("g1", 2, 3), ("g2", 1, 2)])
    got = _rows(find(e2, "(a)-[]->(b); (b)-[]->(c)"), "graph", "a", "b", "c")
    assert got == {("g1", 1, 2, 3)}


def test_self_loop_patterns(spark):
    e = _edges(spark, [("g", 1, 1), ("g", 1, 2), ("g", 2, 3)])
    assert _rows(find(e, "(a)-[]->(a)"), "a") == {(1,)}
    # vertices with an out-edge but no self-loop
    got = _rows(find(e, "(a)-[]->(b); !(a)-[]->(a)"), "a")
    assert got == {(2,)}


def test_error_contract(spark):
    e = _edges(spark, [("g", 1, 2)])
    for bad, why in [
            ("(a)-[]->(b); (c)-[]->(d)", "disconnected"),
            ("(a)->(b)", "unsupported motif term"),
            ("(a)-[]->(b); !(a)-[]->(z)", "unbound"),
            ("(a)-[e]->(b); (b)-[e]->(c)", "used twice"),
            ("(a)-[]->(b); !(a)-[x]->(b)", "anonymous edge"),
            ("!(a)-[]->(b)", "at least one positive"),
            ("", "empty motif"),
    ]:
        with pytest.raises(ValueError, match=why):
            find(e, bad).collect()


def test_brute_force_parity_on_random_digraph(spark):
    rng = random.Random(11)
    n = 9
    edges = {(i, j) for i in range(1, n + 1) for j in range(1, n + 1)
             if i != j and rng.random() < 0.25}
    e = _edges(spark, [("r", s, d) for s, d in edges])
    pattern = "(a)-[]->(b); (b)-[]->(c); (c)-[]->(d); !(a)-[]->(c)"
    got = _rows(find(e, pattern), "a", "b", "c", "d")
    want = {(a, b, c, d)
            for a, b, c, d in itertools.product(range(1, n + 1), repeat=4)
            if (a, b) in edges and (b, c) in edges and (c, d) in edges
            and (a, c) not in edges}
    assert got == want
    assert len(want) > 20  # non-trivial under seed 11


def test_engine_facade_and_store(spark, tmp_path):
    eng = GraphEngine(spark, str(tmp_path / "s"))
    eng.add_graph("T", "3\n0 1 0\n0 0 1\n1 0 0\n")   # directed 3-cycle
    eng.add_graph("P", "3\n0 1 0\n0 0 1\n0 0 0\n")   # path 1→2→3
    tri = eng.find("(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)")
    assert _rows(tri, "graph", "a") == {("T", 1), ("T", 2), ("T", 3)}
    one = eng.find("(a)-[]->(b); (b)-[]->(c)", name="P")
    assert _rows(one, "graph", "a", "b", "c") == {("P", 1, 2, 3)}


def test_weighted_motif_structs_and_post_filter(spark, tmp_path):
    """weighted=True carries the stored w into named-edge structs so
    bindings post-filter with plain expressions — and an anonymous
    edge on the same weighted set binds per edge KEY, never once per
    attribute row."""
    eng = GraphEngine(spark, str(tmp_path / "s"))
    eng.add_graph("W", "3\n0 5 0\n0 0 2\n0 0 0\n")  # (1,2,5) (2,3,2)
    out = eng.find("(a)-[e1]->(b); (b)-[e2]->(c)", weighted=True)
    row = out.collect()[0]
    assert (row["e1"]["src"], row["e1"]["dst"], row["e1"]["w"]) == (1, 2, 5)
    assert row["e2"]["w"] == 2
    assert out.filter("e1.w > 2 AND e2.w <= 2").count() == 1
    assert out.filter("e1.w > 9").count() == 0
    # anonymous edges over the weighted set: same binding count as the
    # unweighted pattern
    anon = eng.find("(a)-[]->(b); (b)-[]->(c)", weighted=True)
    assert anon.count() == eng.find("(a)-[]->(b); (b)-[]->(c)").count() == 1


def test_name_collision_contract(spark):
    """Round-9 advice low: names colliding with the reserved output
    columns, used as both a vertex and an edge, or squatting on the
    internal anonymous namespace raise the module's documented loud
    ValueError instead of an opaque AnalysisException."""
    e = _edges(spark, [("g", 1, 2), ("g", 2, 3)])
    for bad, why in [
            ("(graph)-[]->(b)", "reserved"),
            ("(a)-[src]->(b)", "reserved"),
            ("(a)-[]->(dst)", "reserved"),
            ("(a)-[a]->(b)", "both a vertex and an edge"),
            ("(a)-[e]->(b); (e)-[]->(c)", "both a vertex and an edge"),
            ("(__anon1)-[]->(b)", "anonymous-vertex namespace"),
            ("(a)-[__anon2]->(b)", "anonymous-vertex namespace"),
    ]:
        with pytest.raises(ValueError, match=why):
            find(e, bad).collect()


def test_find_vertex_structs(spark, tmp_path):
    """GraphFrames output-shape parity: vertex_structs=True returns
    each named vertex as a struct of its vertex row (vid + declared
    properties), filterable like GraphFrames bindings."""
    eng = GraphEngine(spark, str(tmp_path / "vs"))
    eng.append_edges(spark.createDataFrame(
        [("g", 1, 2, 3), ("g", 2, 3, 1)],
        "graph string, src int, dst int, w int"))
    eng.set_vertex_props(spark.createDataFrame(
        [("g", 1, "hub"), ("g", 2, "mid")],
        "graph string, vid int, tag string"))
    out = eng.find("(a)-[e]->(b)", weighted=True, vertex_structs=True)
    rows = {(r["a"]["vid"], r["b"]["vid"]): r for r in out.collect()}
    assert set(rows) == {(1, 2), (2, 3)}
    assert rows[(1, 2)]["a"]["tag"] == "hub"
    assert rows[(1, 2)]["b"]["tag"] == "mid"
    assert rows[(2, 3)]["b"]["tag"] is None   # vid 3 has no props row value
    assert rows[(1, 2)]["e"]["w"] == 3
    # filter on a vertex-struct field, GraphFrames-style
    assert out.filter("a.tag = 'hub'").count() == 1
    # default shape unchanged: bare long vids
    bare = eng.find("(a)-[]->(b)")
    assert dict(bare.dtypes)["a"] == "bigint"
