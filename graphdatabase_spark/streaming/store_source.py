"""A STREAMING SOURCE over the store's commit chain — the read half
of the Delta streaming economics (round-13 verdict item 6): the store
could be WRITTEN by a stream (``store_stream_ingest``'s exactly-once
append commits) but nothing could tail it. This implements tailing as
a PySpark 4 Python Data Source (``spark.dataSource.register`` +
``readStream.format("gdb_commits")``), so the commit log becomes a
first-class Structured Streaming source with offsets in the
consumer's own checkpoint:

- **Offset** = the last fully-consumed manifest ``seq`` (JSON
  ``{"seq": N}``), persisted by Spark's checkpoint machinery — the
  exactly-once contract across restarts comes from the engine's
  offset log, exactly like every built-in source.
- **Micro-batch planning** (driver): for each manifest in
  ``(start, end]``, diff its per-graph chain pointers against the
  previous manifest. A graph whose chain was EXTENDED (append commits
  — bulk ``append_edges``, streaming ingest batches, merge-on-read
  delta commits) emits the new commit's rows; a graph whose pointer
  was REPLACED (COW merge, compaction, overwrite of an existing
  graph, restore) is SKIPPED — Delta's ``skipChangeCommits`` rule: a
  rewrite re-states old data, and re-emitting it would double-count.
  A graph NEW to the store emits its first commit wholesale (new data
  by definition). Metadata-only commits (ALTER/RENAME/DROP COLUMN,
  policy) extend no chain and emit nothing.
- **Partitions**: one input partition per (seq, commit, bucket) in a
  bucketed store — executors read their bucket's parquet through
  pyarrow directly, no driver fan-in; a legacy graph-partitioned
  store gets one partition per (seq, commit). At scale an append
  commit is one micro-batch's worth of files, so a tailing consumer
  reads O(batch) regardless of store size.
- **Rows**: the core edge columns stamped with the publishing seq —
  ``(graph, src, dst, w, seq)``. Merge-on-read delta commits emit
  their rows RAW, so a ``w = 0`` row is the store's delete marker —
  the change-feed consumer sees deletes as deletes. Typed edge
  property columns are not carried (a streaming schema must be
  stable for a run; core columns are).
- **``option("table", "vertices")``** switches to the VERTEX change
  feed: ``(graph, vid, *declared vertex props, seq)`` — membership
  rows from edge appends (props None), ``set_vertex_props`` delta
  rows raw. The prop schema is pinned per run from the manifest at
  query start (a consumer restarted after schema evolution picks up
  the evolved schema), and a RENAMEd column is served under its
  logical name: the colmap rides into every partition and executors
  read the physical parquet column.
- **Batch form**: ``spark.read.format("gdb_commits")`` replays the
  retained history with the identical planner and skip rule, so
  backfill-then-tail composes without gaps or double counts.

Scope: the planner opens the manifest log directly (POSIX path — the
local/NFS store layout; the S3 store would swap in
``S3ManifestStore`` the same way), because Python data source
planning runs without a SparkSession. A consumed-then-vacuumed range
raises FileNotFoundError instead of silently skipping data —
``starting_seq`` lets a new consumer start past vacuumed history.

Reference parity note: the reference has no streaming surface at all
(its server loop is request/response, ``primary_server.c``); this is
engine-native capability in Delta/Iceberg's direction.
"""

from __future__ import annotations

import os
from urllib.parse import unquote

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)

SCHEMA = "graph string, src int, dst int, w int, seq int"


def _cids(ptr) -> list[str]:
    return list(ptr) if isinstance(ptr, list) else [ptr]


class CommitPartition(InputPartition):
    def __init__(self, store: str, cid: str, seq: int,
                 graphs: list[str], gb: int | None,
                 table: str = "edges",
                 prop_cols: list[tuple[str, str]] | None = None):
        self.store = store
        self.cid = cid
        self.seq = seq
        self.graphs = graphs
        self.gb = gb
        self.table = table
        # vertices only: declared props as (logical, physical) pairs
        # in declaration order — the colmap applied executor-side
        self.prop_cols = prop_cols or []


def _vertex_props(doc: dict) -> list[tuple[str, str]]:
    """Declared vertex props of manifest ``doc`` as (logical,
    physical) pairs in declaration order — RENAMEd columns read their
    original physical parquet column (the same colmap rule as
    GraphSnapshot reads)."""
    props = doc.get("props", {}).get("vertices", {})
    cmap = doc.get("colmap", {}).get("vertices", {})
    return [(n, cmap.get(n, n)) for n in props]


class GraphStoreStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError(
                "gdb_commits: .option('path', <store dir>) is required")
        if "://" in path or path.startswith("file:"):
            # planning runs without a SparkSession, so only the POSIX
            # metadata store is wired here; an S3 store would swap in
            # S3ManifestStore + pyarrow's S3 filesystem the same way.
            # Loud beats a confusing downstream listing error.
            raise NotImplementedError(
                f"gdb_commits: scheme store paths are not wired into the "
                f"Python-data-source planner yet (got {path!r}); use a "
                f"local/NFS store path")
        self._store = path
        self._start = int(options.get("starting_seq", 0))
        self._table = options.get("table", "edges")
        if self._table not in ("edges", "vertices"):
            raise ValueError(
                f"gdb_commits: table must be 'edges' or 'vertices', "
                f"got {self._table!r}")
        # driver-side manifest access without a SparkSession: the
        # POSIX metadata store (same blobs the engine writes)
        from graphdatabase_spark.metastore import (ManifestLog,
                                                   PosixManifestStore)
        self._log = ManifestLog(
            PosixManifestStore(os.path.join(path, "manifests")))
        # vertices: the prop columns are pinned ONCE at reader
        # construction (query start), matching the DataSource schema
        # pinned at the same moment — NOT per micro-batch: a column
        # declared mid-stream must not widen later batches' rows
        # beyond the query's schema (restart the consumer to pick up
        # evolved schema, the Delta convention)
        self._pcols = (_vertex_props(self._log.load() or {})
                       if self._table == "vertices" else [])

    # -- offsets ------------------------------------------------------

    def initialOffset(self) -> dict:
        return {"seq": self._start}

    def latestOffset(self) -> dict:
        names = self._log.names()
        return {"seq": names[-1][0] if names else self._start}

    def commit(self, end: dict) -> None:
        pass   # Spark's checkpoint offset log IS the consumer state

    # -- planning (driver, metadata-only) ------------------------------

    def _doc(self, seq: int) -> dict:
        if seq <= 0:
            return {}
        doc = self._log.load(seq)   # raises FileNotFoundError if vacuumed
        return doc or {}

    def partitions(self, start: dict, end: dict):
        s0, s1 = int(start["seq"]), int(end["seq"])
        parts: list[CommitPartition] = []
        prev = self._doc(s0)
        # the construction-time prop schema (see __init__) — the
        # colmap rides into every partition so executors read the
        # physical parquet columns
        pcols = self._pcols
        for seq in range(s0 + 1, s1 + 1):
            cur = self._doc(seq)
            pg, cg = prev.get("graphs", {}), cur.get("graphs", {})
            emit: dict[str, list[str]] = {}
            for g, ptr in cg.items():
                chain, old = _cids(ptr), _cids(pg[g]) if g in pg else []
                if chain[:len(old)] != old:
                    continue   # pointer replaced: rewrite — skipped
                for cid in chain[len(old):]:
                    emit.setdefault(cid, []).append(g)
            buckets = cur.get("buckets")
            for cid, graphs in sorted(emit.items()):
                if buckets:
                    from graphdatabase_spark.metastore import graph_bucket
                    by_gb: dict[int, list[str]] = {}
                    for g in graphs:
                        by_gb.setdefault(
                            graph_bucket(g, buckets), []).append(g)
                    parts.extend(
                        CommitPartition(self._store, cid, seq, gs, gb,
                                        self._table, pcols)
                        for gb, gs in sorted(by_gb.items()))
                else:
                    parts.append(
                        CommitPartition(self._store, cid, seq, graphs, None,
                                        self._table, pcols))
            prev = cur
        return parts

    # -- executor read (no SparkSession: pyarrow over the commit dir) --

    def read(self, partition: CommitPartition):
        import pyarrow.dataset as pads

        path = os.path.join(partition.store, "data", partition.table,
                            f"c={partition.cid}")
        if partition.gb is not None:
            path = os.path.join(path, f"gb={partition.gb}")
        if not os.path.isdir(path):
            return   # this commit wrote no rows for this table
        dset = pads.dataset(path, format="parquet", partitioning="hive")
        names = set(dset.schema.names)
        want = set(partition.graphs)
        if partition.table == "vertices":
            # physical prop columns present in THIS commit's files;
            # absent ones (commits predating the column) read None —
            # the same NULL-backfill rule as the snapshot scan
            phys = [p for _, p in partition.prop_cols]
            cols = ["graph", "vid"] + [p for p in phys if p in names]
        else:
            cols = [c for c in ("graph", "src", "dst", "w") if c in names]
        for batch in dset.to_table(columns=cols).to_batches():
            d = batch.to_pydict()
            n = len(d[cols[0]])
            # legacy layout (gb is None): graph is a hive partition
            # value Spark %-escaped at write (Hive's escapePathName)
            # — unquote it. Bucketed layout: graph is a plain data
            # column, taken verbatim (unquoting could mangle a name
            # that legitimately contains '%').
            graphs = ([unquote(str(g)) for g in d["graph"]]
                      if partition.gb is None
                      else [str(g) for g in d["graph"]])
            if partition.table == "vertices":
                for i in range(n):
                    if graphs[i] in want:
                        yield (graphs[i], d["vid"][i],
                               *[d[p][i] if p in d else None
                                 for _, p in partition.prop_cols],
                               partition.seq)
            else:
                ws = d.get("w", [1] * n)
                for i in range(n):
                    if graphs[i] in want:
                        yield (graphs[i], d["src"][i], d["dst"][i],
                               int(ws[i] if ws[i] is not None else 1),
                               partition.seq)


class GraphStoreBatchReader(DataSourceReader):
    """The BATCH form of the same planner — ``spark.read.format(
    "gdb_commits")`` replays the whole retained chain history
    (``starting_seq`` .. latest) in one read: the backfill that seeds
    a consumer before it switches to tailing, with identical
    per-commit rows and the identical skip-rewrites rule, so
    backfill-then-tail composes without gaps or double counts."""

    def __init__(self, options: dict):
        self._stream = GraphStoreStreamReader(options)

    def partitions(self):
        return self._stream.partitions(self._stream.initialOffset(),
                                       self._stream.latestOffset())

    def read(self, partition: CommitPartition):
        return self._stream.read(partition)


class GraphStoreDataSource(DataSource):
    """``spark.dataSource.register(GraphStoreDataSource)`` then
    ``spark.readStream.format("gdb_commits").option("path", store)``
    to tail, or ``spark.read.format("gdb_commits")`` to backfill the
    retained history — see the module docstring for semantics."""

    @classmethod
    def name(cls) -> str:
        return "gdb_commits"

    def schema(self) -> str:
        if self.options.get("table", "edges") != "vertices":
            return SCHEMA
        # the VERTEX change feed: core key + the store's declared
        # vertex props (logical names) at query-start, + seq. Schema
        # is pinned per run — a consumer restarted after schema
        # evolution picks up the evolved schema; executors read
        # physical columns through the colmap carried per partition.
        from graphdatabase_spark.metastore import (ManifestLog,
                                                   PosixManifestStore)
        doc = ManifestLog(PosixManifestStore(
            os.path.join(self.options["path"], "manifests"))).load() or {}
        props = doc.get("props", {}).get("vertices", {})
        return ("graph string, vid int"
                + "".join(f", {n} {t}" for n, t in props.items())
                + ", seq int")

    def streamReader(self, schema) -> GraphStoreStreamReader:
        return GraphStoreStreamReader(self.options)

    def reader(self, schema) -> GraphStoreBatchReader:
        return GraphStoreBatchReader(self.options)
