"""The two GraphFrames surfaces a user reaches for after ``find``
(round-9 verdict item 6): expression-targeted BFS
(``engine.bfs_expr`` ≡ GraphFrames ``bfs(fromExpr, toExpr)``) and one
round of triplet message passing (``engine.aggregate_messages`` ≡
GraphFrames ``aggregateMessages``), both over the existing grouped
Pregel kernel / snapshot reads — no new execution machinery."""

import pytest
from pyspark.sql import functions as F

from graphdatabase_spark.engine import GraphEngine

pytestmark = pytest.mark.slow  # heavyweight integration module: full-suite tier (pyproject.toml)


@pytest.fixture()
def engine(spark, tmp_path):
    eng = GraphEngine(spark, str(tmp_path / "store"))
    # P: path 1→2→3→4→5; Q: star 1→{2,3}, plus 3→4
    eng.append_edges(spark.createDataFrame(
        [("P", 1, 2, 1), ("P", 2, 3, 1), ("P", 3, 4, 1), ("P", 4, 5, 1),
         ("Q", 1, 2, 2), ("Q", 1, 3, 5), ("Q", 3, 4, 7)],
        "graph string, src int, dst int, w int"))
    return eng


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bfs_expr_vid_predicates_all_graphs(engine):
    # from vid=1 to "vid >= 4": P's nearest match is 4 at 3 hops;
    # Q's is 4 at 2 hops — per-graph minima, one grouped kernel run
    assert _rows(engine.bfs_expr("vid = 1", "vid >= 4")) == [
        ("P", 4, 3), ("Q", 4, 2)]


def test_bfs_expr_zero_hop_and_tie(engine):
    # a vertex matching BOTH predicates is a length-0 path
    assert _rows(engine.bfs_expr("vid <= 2", "vid = 2")) == [
        ("P", 2, 0), ("Q", 2, 0)]
    # ties at the minimal distance all return (2 and 3 both 1 hop in Q)
    assert _rows(engine.bfs_expr("vid = 1", "vid IN (2, 3)",
                                 name="Q")) == [("Q", 2, 1), ("Q", 3, 1)]


def test_bfs_expr_no_source_or_unreachable_is_empty(engine):
    assert engine.bfs_expr("vid = 99", "vid = 1").count() == 0
    # vid 1 has no in-edges anywhere: unreachable from vid 5
    assert engine.bfs_expr("vid = 5", "vid = 1").count() == 0
    # max_hops cuts the search: P needs 3 hops to reach 4
    assert engine.bfs_expr("vid = 1", "vid = 4", name="P",
                           max_hops=2).count() == 0


def test_bfs_expr_vertex_property_predicates(engine, spark):
    engine.set_vertex_props(spark.createDataFrame(
        [("P", v, "hub" if v in (1, 4) else "leaf") for v in range(1, 6)],
        "graph string, vid int, role string"))
    assert _rows(engine.bfs_expr("role = 'hub' AND vid = 1",
                                 "role = 'hub' AND vid <> 1",
                                 name="P")) == [("P", 4, 3)]


def test_aggregate_messages_degree_parity(engine):
    """count-messages ≡ graph_degree for every fixture vertex — the
    verdict's named parity pin."""
    for g in ("P", "Q"):
        out_d = {r["vid"]: r["agg_value"] for r in engine.aggregate_messages(
            "count(msg)", send_to_src="1", name=g).collect()}
        in_d = {r["vid"]: r["agg_value"] for r in engine.aggregate_messages(
            "count(msg)", send_to_dst="1", name=g).collect()}
        for r in engine.degrees(g).collect():
            assert out_d.get(r["vid"], 0) == r["out_degree"]
            assert in_d.get(r["vid"], 0) == r["in_degree"]


def test_aggregate_messages_triplet_expressions(engine, spark):
    # weighted in-degree: sum of incoming edge weights per vertex
    got = {(r["graph"], r["vid"]): r["agg_value"]
           for r in engine.aggregate_messages(
               "sum(msg)", send_to_dst="edge.w").collect()}
    assert got[("Q", 2)] == 2 and got[("Q", 3)] == 5 and got[("Q", 4)] == 7
    # messages may read BOTH endpoint structs: send each neighbor's vid
    # to the other side, max-aggregated
    got = {(r["graph"], r["vid"]): r["agg_value"]
           for r in engine.aggregate_messages(
               "max(msg)", send_to_src="dst.vid",
               send_to_dst="src.vid", name="Q").collect()}
    assert got[("Q", 1)] == 3      # 1's neighbors: 2, 3
    assert got[("Q", 4)] == 3      # 4 hears from 3
    # vertex properties are visible through the endpoint structs
    engine.set_vertex_props(spark.createDataFrame(
        [("Q", v, v * 10) for v in (1, 2, 3, 4)],
        "graph string, vid int, score int"))
    got = {r["vid"]: r["agg_value"] for r in engine.aggregate_messages(
        "sum(msg)", send_to_dst="src.score * edge.w", name="Q").collect()}
    assert got[2] == 20 and got[3] == 50 and got[4] == 210


def test_aggregate_messages_requires_a_leg(engine):
    with pytest.raises(ValueError, match="send_to_src"):
        engine.aggregate_messages("count(msg)")


def test_shortest_paths_landmarks(engine):
    """GraphFrames shortestPaths: distance from every vertex TO each
    landmark (directed, reversed-edge BFS), landmark at distance 0
    from itself, unreachable pairs absent."""
    got = _rows(engine.shortest_paths([5, 2], name="P"))
    # P is the path 1→2→3→4→5: everything reaches 5; only 1 reaches 2
    assert got == [("P", 1, 2, 1), ("P", 1, 5, 4), ("P", 2, 2, 0),
                   ("P", 2, 5, 3), ("P", 3, 5, 2), ("P", 4, 5, 1),
                   ("P", 5, 5, 0)]
    # all graphs in one call; Q has no vertex 5, so only landmark 2
    allg = _rows(engine.shortest_paths([2]))
    assert ("Q", 1, 2, 1) in allg and ("Q", 2, 2, 0) in allg
    assert not [r for r in allg if r[0] == "Q" and r[1] in (3, 4)]
    with pytest.raises(ValueError, match="at least one landmark"):
        engine.shortest_paths([])


def test_pregel_max_propagation_components(engine):
    """engine.pregel (the GraphFrames lib.Pregel surface): max-vid
    propagation with bidirectional messages converges to the
    undirected component's max vid — P (path to 5) all 5, Q all 4."""
    out = engine.pregel(
        "cc", initial_expr="vid",
        send_to_src="dst.cc", send_to_dst="src.cc",
        agg_expr="max(msg)",
        update_expr="greatest(cc, coalesce(msg, cc))",
        max_iter=4)
    got = {(r["graph"], r["vid"]): r["cc"] for r in out.collect()}
    assert all(v == 5 for (g, _), v in got.items() if g == "P")
    assert all(v == 4 for (g, _), v in got.items() if g == "Q")


def test_pregel_until_converged_stops_at_fixpoint(engine, monkeypatch):
    """until_converged (GraphFrames' early-stopping knob): a fixpoint
    algorithm stops when a superstep changes no state — same answer as
    the fixed-iteration run even with max_iter far beyond the
    diameter, and the loop demonstrably runs FEWER supersteps (counted
    through the kernels' one checkpoint call: 1 initial + 1 per
    superstep). P is a 5-path, so max propagation converges in 4
    effective rounds + 1 no-change round — far under the 50 budget."""
    from graphdatabase_spark import engine as engine_mod

    kwargs = dict(initial_expr="vid",
                  send_to_src="dst.cc", send_to_dst="src.cc",
                  agg_expr="max(msg)",
                  update_expr="greatest(cc, coalesce(msg, cc))")
    fixed = {(r["graph"], r["vid"]): r["cc"]
             for r in engine.pregel("cc", max_iter=8, **kwargs).collect()}

    calls = []
    real = engine_mod.pregel._ckpt
    monkeypatch.setattr(engine_mod.pregel, "_ckpt",
                        lambda df: calls.append(1) or real(df))
    early = {(r["graph"], r["vid"]): r["cc"]
             for r in engine.pregel("cc", max_iter=50,
                                    until_converged=True,
                                    **kwargs).collect()}
    assert early == fixed
    # 1 initial + <=6 supersteps (diameter 4 + one all-quiet round +
    # slack), NOT the 51 a non-stopping loop would make
    assert 2 <= len(calls) <= 7, len(calls)


def test_pregel_one_round_equals_aggregate_messages(engine):
    """One superstep with a count aggregate reproduces in-degree
    (aggregateMessages parity), isolated vertices keeping NULL-msg
    semantics through the update expression."""
    out = engine.pregel(
        "indeg", initial_expr="CAST(0 AS BIGINT)",
        send_to_dst="1", agg_expr="count(msg)",
        update_expr="coalesce(msg, CAST(0 AS BIGINT))",
        max_iter=1, name="Q")
    got = {r["vid"]: r["indeg"] for r in out.collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 1}
    # messages see the evolving state AND edge attributes
    out = engine.pregel(
        "acc", initial_expr="CAST(vid AS BIGINT)",
        send_to_dst="src.acc * edge.w", agg_expr="sum(msg)",
        update_expr="coalesce(msg, CAST(0 AS BIGINT))",
        max_iter=1, name="Q")
    got = {r["vid"]: r["acc"] for r in out.collect()}
    assert got == {1: 0, 2: 2, 3: 5, 4: 21}


def test_pregel_error_contract(engine):
    with pytest.raises(ValueError, match="send_to_src"):
        engine.pregel("x", "0", "max(msg)", "msg", max_iter=1)
    with pytest.raises(ValueError, match="reserved"):
        engine.pregel("graph", "0", "max(msg)", "msg",
                      send_to_dst="1", max_iter=1)
    # round-11 ADVICE: until_converged's fixpoint test set-compares
    # the state column, and Spark set ops reject map types — fail
    # FAST with the knob named, not with an AnalysisException deep in
    # superstep k
    with pytest.raises(ValueError, match="until_converged"):
        engine.pregel("m", "map('k', vid)", "first(msg)",
                      "coalesce(msg, m)", send_to_dst="src.m",
                      max_iter=3, until_converged=True)
    # the same map-typed state WITHOUT the knob runs fine
    out = engine.pregel("m", "map('k', vid)", "first(msg)",
                        "coalesce(msg, m)", send_to_dst="src.m",
                        max_iter=1, name="Q")
    assert out.count() == 4


def test_triplets_view(engine, spark):
    """GraphFrames triplets: endpoint vertex structs + edge struct,
    properties visible through both."""
    engine.set_vertex_props(spark.createDataFrame(
        [("Q", 1, "root")], "graph string, vid int, role string"))
    trip = engine.triplets("Q")
    assert trip.columns == ["graph", "src", "edge", "dst"]
    rows = {(r["src"]["vid"], r["dst"]["vid"]): r for r in trip.collect()}
    assert set(rows) == {(1, 2), (1, 3), (3, 4)}
    assert rows[(1, 2)]["edge"]["w"] == 2
    assert rows[(1, 2)]["src"]["role"] == "root"
    assert rows[(3, 4)]["src"]["role"] is None


def test_pregel_rejects_declared_prop_collisions(engine, spark):
    engine.set_vertex_props(spark.createDataFrame(
        [("P", 1, "a")], "graph string, vid int, tag string"))
    with pytest.raises(ValueError, match="declared vertex property"):
        engine.pregel("TAG", "0", "max(msg)", "msg", send_to_dst="1",
                      max_iter=1)
    eng2 = GraphEngine(spark, engine.store + "2")
    eng2.append_edges(spark.createDataFrame(
        [("Z", 1, 2, 1)], "graph string, src int, dst int, w int"))
    eng2.set_vertex_props(spark.createDataFrame(
        [("Z", 1, "m")], "graph string, vid int, msg string"))
    with pytest.raises(ValueError, match="property named 'msg'"):
        eng2.pregel("x", "0", "max(msg)", "msg", send_to_dst="1",
                    max_iter=1)


def test_shortest_paths_graph_names_with_separator_bytes(spark, tmp_path):
    """Review r10: the landmark is a grouping KEY, never packed into
    the graph-name string — names with control bytes stay intact."""
    eng = GraphEngine(spark, str(tmp_path / "sep"))
    weird = "a\x1fb"
    eng.append_edges(spark.createDataFrame(
        [(weird, 1, 2, 1), (weird, 2, 3, 1)],
        "graph string, src int, dst int, w int"))
    got = sorted(tuple(r) for r in eng.shortest_paths([3]).collect())
    assert got == [(weird, 1, 3, 2), (weird, 2, 3, 1), (weird, 3, 3, 0)]


def test_duplicate_vertex_rows_do_not_multiply_triplets(spark, tmp_path):
    """Review r10: concurrent same-graph appends can duplicate a
    (graph, vid) vertex row (compaction is the heal point); the
    triplet/message surfaces must dedupe before joining."""
    from graphdatabase_spark import metastore

    store = metastore.InMemoryManifestStore()
    eng = GraphEngine(spark, str(tmp_path / "d"), manifest_store=store)
    eng.append_edges(spark.createDataFrame(
        [("D", 1, 2, 1)], "graph string, src int, dst int, w int"))
    fired = {}

    def interleave(name):
        if not fired:
            fired["x"] = True
            store.before_put = None
            GraphEngine(spark, eng.store, manifest_store=store) \
                .append_edges(spark.createDataFrame(
                    [("D", 5, 3, 1)],
                    "graph string, src int, dst int, w int"))

    store.before_put = interleave
    # vid 5 is NEW to both concurrent batches: each anti-joins against
    # the same pre-append snapshot, so both write a vertex row for it
    eng.append_edges(spark.createDataFrame(
        [("D", 5, 4, 1)], "graph string, src int, dst int, w int"))
    vids = [r["vid"] for r in eng.vertices("D").collect()]
    assert vids.count(5) == 2   # the race really duplicated the row
    n_edges = eng.weighted_edges("D").count()
    assert eng.triplets("D").count() == n_edges
    got = {r["vid"]: r["agg_value"] for r in eng.aggregate_messages(
        "count(msg)", send_to_dst="1", name="D").collect()}
    assert got == {2: 1, 3: 1, 4: 1}
