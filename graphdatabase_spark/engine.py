"""User-facing engine facade mirroring the reference's operation
surface (SURVEY.md §7 step 8).

The reference exposes, via its client menu (``client.c:385-400``):
op 1 add graph, op 2 modify graph (identical code path,
``primary_server.c:223``), op 3 DFS-forest leaves, op 4 BFS level
order, op 5 terminate — plus Assignment1's ping / file-search /
word-count (``Assignment1/server.c:384-398``). Everything the
reference does with message queues, shared memory, semaphore RW locks
and replica routing collapses into Spark's own scheduler + storage
semantics (SURVEY.md §3.3, §4.1):

- **Write atomicity** (the reference's per-file named-semaphore RW
  lock, ``primary_server.c:110-146``): dynamic partition overwrite on
  a ``graph``-partitioned Parquet table — readers see the old or the
  new snapshot of a graph, never a torn one, and other graphs'
  partitions are untouched.
- **Full-overwrite semantics** (op 1 ≡ op 2): both map to
  ``add_graph``; the partition is replaced wholesale.
- **1-indexed vertices** user-facing, exactly as the reference
  (``client.c:185`` subtracts 1 on the way in; we skip the dance and
  store 1-indexed ids end to end).
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabase_spark import cache
from graphdatabase_spark.functions.text import tokens_col
from graphdatabase_spark.operators import dfs as dfs_mod
from graphdatabase_spark.operators import graph_algos, pregel
from graphdatabase_spark.sources import matrix as matrix_mod

EDGES_SCHEMA = "src int, dst int, graph string"
VERTICES_SCHEMA = "vid int, graph string"
META_SCHEMA = "n int, graph string"


class GraphEngine:
    """Named-graph store + traversal queries over a Parquet-backed
    edge/vertex catalog, one pair of tables for the whole corpus of
    graphs (that layout — not a file per graph — is what scales;
    SURVEY.md §1.4)."""

    def __init__(self, spark: SparkSession, store_path: str):
        self.spark = spark
        self.store = store_path
        self.edges_path = os.path.join(store_path, "edges")
        self.vertices_path = os.path.join(store_path, "vertices")
        self.meta_path = os.path.join(store_path, "meta")

    # -- op 1 / op 2: add / modify (full overwrite of one graph) ---------

    def add_graph(self, name: str, matrix_text: str) -> None:
        """Ingest one adjacency-matrix text (the reference's exchange
        format) and atomically replace that graph's partition."""
        self._write(matrix_mod.lines_from_text(self.spark, name, matrix_text))

    # op 2 routes to the same implementation as op 1 — faithfully
    # mirroring the reference's dispatch (primary_server.c:223,
    # load_balancer.c:170).
    modify_graph = add_graph

    def ingest_dir(self, path: str) -> None:
        """Bulk ingest a directory of matrix files (distributed read)."""
        self._write(matrix_mod.read_matrix_files(self.spark, path))

    def _write(self, lines: DataFrame) -> None:
        # Dynamic partition overwrite = replace exactly the graphs
        # present in this write, atomically per partition; concurrent
        # readers keep the prior snapshot (immutable files). The meta
        # table records every graph — including N=0 graphs, whose edge/
        # vertex partitions are legitimately empty (the reference's
        # G12.txt edge case).
        #
        # The three tables are three independent per-partition-atomic
        # writes, NOT one cross-table transaction (the reference's
        # per-graph RW lock covers all state at once). Meta is
        # deliberately written LAST as the commit marker: a reader that
        # takes `graphs()` membership from meta before touching edges/
        # vertices never observes a half-written new graph. A reader
        # that races a *modify* of a graph it already knows can still
        # see new edges with old vertices during the window — callers
        # needing full snapshot isolation should version the store path.
        meta = lines.filter(F.col("line_no") == 0).select(
            F.trim(F.col("line")).cast("int").alias("n"), "graph")
        # Every graph in this write, from the meta rows (one per graph,
        # even N=0). Needed below: dynamic overwrite only replaces
        # partitions that RECEIVE rows, so a modify that empties a graph
        # (all-zero matrix, N=0) would otherwise leave the old edges/
        # vertices partitions serving stale data.
        write_graphs = {r["graph"] for r in meta.select("graph").distinct().collect()}
        writes = (
            (matrix_mod.melt_matrix_lines(lines), self.edges_path),
            (matrix_mod.matrix_vertices(lines), self.vertices_path),
            (meta, self.meta_path),
        )
        for df, path in writes:
            out = df.select(*[c for c in df.columns if c != "graph"], "graph")
            (out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("graph").parquet(path))
            present = {r["graph"] for r in out.select("graph").distinct().collect()}
            for g in sorted(write_graphs - present):
                # Explicitly clear the partition the dynamic write never
                # touched: an empty overwrite of graph=<g> removes the
                # stale files (the explicit-schema read then yields 0
                # rows for it).
                (out.filter(F.lit(False)).drop("graph")
                    .write.mode("overwrite").parquet(os.path.join(path, f"graph={g}")))

    # -- catalog ----------------------------------------------------------

    def _read(self, path: str, schema: str) -> DataFrame:
        # Explicit schema: correct result even when a table has no
        # partitions yet (e.g. only empty graphs written). A store no
        # write has touched yet has no table directory at all — an
        # empty relation, not an error, so every query path (edges,
        # vertices, bfs, ...) shares graphs()' empty-store contract.
        # The not-yet-written case is detected from Spark's own
        # PATH_NOT_FOUND error rather than a driver-local filesystem
        # check: os.path.exists is always false for hdfs:// / s3a://
        # store paths and would silently turn every remote read into an
        # empty relation.
        try:
            return self.spark.read.schema(schema).parquet(path)
        except AnalysisException as exc:
            cond = exc.getCondition() if hasattr(exc, "getCondition") else None
            if "PATH_NOT_FOUND" in (cond or str(exc)):
                return self.spark.createDataFrame([], schema)
            raise

    def graphs(self) -> list[str]:
        return [r["graph"] for r in
                self._read(self.meta_path, META_SCHEMA)
                .select("graph").distinct().orderBy("graph").collect()]

    def edges(self, name: str | None = None) -> DataFrame:
        df = self._read(self.edges_path, EDGES_SCHEMA)
        # graph is the partition column → partition pruning, no scan of
        # other graphs' files.
        return df.filter(F.col("graph") == name) if name else df

    def vertices(self, name: str | None = None) -> DataFrame:
        df = self._read(self.vertices_path, VERTICES_SCHEMA)
        return df.filter(F.col("graph") == name) if name else df

    # -- op 4: BFS level order -------------------------------------------

    def bfs(self, name: str, start: int) -> DataFrame:
        """``(vertex, level)`` for every vertex reachable from
        ``start`` (1-indexed). Level-sets match the reference's own
        oracle (``utils/bfs_checker.py:75-76``); within-level order is
        unspecified, exactly as in the reference (SURVEY §2.2)."""
        levels = pregel.bfs_levels(self.edges(name).select("src", "dst"), [start])
        return levels.select(F.col("vid").cast("int").alias("vertex"), "level")

    def bfs_all(self, start: int) -> DataFrame:
        """Batched op 4: ``(graph, vertex, level)`` from ``start`` for
        EVERY stored graph that contains the start vertex, in ONE
        superstep loop over the store's single partitioned edge table
        (the set-oriented form of the reference's one-graph-per-request
        serving — SURVEY §1.4's "a directory of graphs is one table").
        Per-graph results are identical to :meth:`bfs` (pinned by
        tests over the reference fixture corpus)."""
        starts = (self.vertices().filter(F.col("vid") == start)
                  .select("graph", F.col("vid").cast("long")))
        # Only participating graphs' edges get shuffled/persisted: a
        # store where most graphs lack the start vertex must not pay
        # O(all edges) per superstep for graphs that can never traverse.
        edges = (self.edges().select("graph", "src", "dst")
                 .join(starts.select("graph").distinct(), "graph", "left_semi"))
        out = pregel.bfs_levels_grouped(edges, starts)
        return out.select("graph", F.col("vid").cast("int").alias("vertex"), "level")

    # -- op 3: DFS-forest leaves ------------------------------------------

    def dfs_leaves(self, name: str, start: int) -> DataFrame:
        """Deterministic canonical-DFS respec of the reference's racy
        concurrent DFS (SURVEY §2.1 A2-3): ``(leaf)``, 1-indexed."""
        starts = self.spark.createDataFrame([(name, start)], "graph string, start long")
        out = dfs_mod.dfs_leaves(self.edges(name).select("graph", "src", "dst"), starts)
        return out.select(F.col("leaf").cast("int").alias("leaf"))

    def dfs_leaves_all(self, start: int) -> DataFrame:
        """Batched op 3: ``(graph, leaf)`` from ``start`` for EVERY
        stored graph containing the start vertex — the DFS kernel is
        already group-per-graph (one ``applyInPandas`` group each), so
        the whole store traverses in one job. Per-graph results equal
        :meth:`dfs_leaves` (pinned by tests)."""
        starts = (self.vertices().filter(F.col("vid") == start)
                  .select("graph", F.col("vid").cast("long").alias("start")))
        edges = (self.edges().select("graph", "src", "dst")
                 .join(starts.select("graph").distinct(), "graph", "left_semi"))
        out = dfs_mod.dfs_leaves(edges, starts)
        return out.select("graph", F.col("leaf").cast("int").alias("leaf"))

    def stats(self) -> DataFrame:
        """Catalog statistics for every stored graph in one pass:
        ``(graph, n_vertices, n_edges, max_out_degree)`` — the numbers
        a planner (or an operator like the k-core broadcast gate) asks
        before choosing a strategy. Two map-side-combined aggregates
        over the store tables + broadcast-able joins against the meta
        graph list, so an EMPTY graph (zero vertex rows) still reports
        0/0/0 instead of vanishing from the aggregate."""
        base = self._read(self.meta_path, META_SCHEMA).select("graph").distinct()
        v = (self.vertices().groupBy("graph")
             .agg(F.count(F.lit(1)).alias("n_vertices")))
        deg = (self.edges().groupBy("graph", "src")
               .agg(F.count(F.lit(1)).alias("d")))
        e = (deg.groupBy("graph")
             .agg(F.sum("d").alias("n_edges"), F.max("d").alias("max_out_degree")))
        return (base.join(v, "graph", "left").join(e, "graph", "left")
                .select("graph",
                        F.coalesce("n_vertices", F.lit(0)).cast("long").alias("n_vertices"),
                        F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
                        F.coalesce("max_out_degree", F.lit(0)).cast("long")
                        .alias("max_out_degree")))

    # -- derived analytics --------------------------------------------------

    def reachable(self, name: str, start: int) -> DataFrame:
        return pregel.reachability(self.edges(name).select("src", "dst"), [start]) \
            .select(F.col("vid").cast("int").alias("vertex"))

    def degrees(self, name: str) -> DataFrame:
        return graph_algos.degrees(self.edges(name).select("src", "dst"))

    def connected_components(self, name: str) -> DataFrame:
        return pregel.connected_components(
            self.edges(name).select("src", "dst"),
            self.vertices(name).select("vid"))

    def pagerank(self, name: str, iterations: int = 10) -> DataFrame:
        """``(vid, rank)`` over one stored graph (float API; the
        registry's oracle-checked path is the quantized variant)."""
        return pregel.pagerank(self.edges(name).select("src", "dst"),
                               self.vertices(name).select("vid"),
                               iterations=iterations)

    def _canonical_undirected(self, name: str) -> DataFrame:
        """Stored graph viewed as undirected: symmetrize, then one
        canonical ``src < dst`` row per edge (self-loops drop — they
        contribute to no triangle/coefficient/core)."""
        e = self.edges(name).select("src", "dst")
        und = e.unionByName(e.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
        return und.filter(F.col("src") < F.col("dst")).distinct()

    def triangle_count(self, name: str) -> DataFrame:
        """Triangle count of the stored graph viewed as undirected."""
        return graph_algos.triangle_count(self._canonical_undirected(name))

    def clustering_coefficient(self, name: str) -> DataFrame:
        """``(vid, deg, n_tri, coeff)`` local clustering coefficients
        of the stored graph viewed as undirected."""
        return graph_algos.clustering_coefficient(self._canonical_undirected(name))

    def k_core(self, name: str, k: int) -> DataFrame:
        """``(vid, core_deg)`` of the stored graph's k-core (undirected
        degrees; iterative peeling)."""
        return graph_algos.k_core(self._canonical_undirected(name), k)

    # -- Assignment1 surface ----------------------------------------------

    def ping(self) -> str:
        """A1 op '1' (``server.c:54-82``) as a real liveness probe: one
        trivial distributed job, then the literal reply."""
        self.spark.range(1).count()
        return "Hello"

    @staticmethod
    def file_search(docs: DataFrame, name: str) -> bool:
        """A1 op '2' (``server.c:88-172``): does a document with this
        source name exist? Predicate over the catalog, pushed to scan."""
        return not docs.filter(F.col("source") == name).isEmpty()

    @staticmethod
    def word_count(docs: DataFrame, doc_id: int) -> int:
        """A1 op '3' (``server.c:179-252``, `wc -w`): token count of one
        document."""
        rows = docs.filter(F.col("doc_id") == doc_id) \
            .select(F.size(tokens_col("text")).alias("n")).collect()
        # n is NULL (not 0) for a NULL text under sizeOfNull=false —
        # a null document counts as zero words, like `wc -w` on nothing.
        return int(rows[0]["n"]) if rows and rows[0]["n"] is not None else 0

    # -- op 5: terminate ----------------------------------------------------

    def shutdown(self) -> None:
        """Op 5 (``load_balancer.c:50-117``): Spark already waits for
        in-flight jobs; no message broadcast or semaphore teardown to
        mirror. Shared operator caches are released first so a
        long-lived session that stops this engine frees its storage
        memory."""
        cache.release_caches()
        self.spark.stop()
