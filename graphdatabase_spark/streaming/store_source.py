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
- **Rows**: the core edge columns PLUS the store's declared edge
  properties, stamped with the publishing seq — ``(graph, src, dst,
  w, *declared edge props, seq)``. Merge-on-read delta commits emit
  their rows RAW, so a ``w = 0`` row is the store's delete marker —
  the change-feed consumer sees deletes as deletes. The prop schema
  is pinned per run from the manifest at query start (commits
  written before a column existed read it as None — the same
  NULL-backfill rule as the snapshot scan), and a RENAMEd column is
  served under its logical name via the colmap, exactly like the
  vertex feed below.
- **``option("table", "vertices")``** switches to the VERTEX change
  feed: ``(graph, vid, *declared vertex props, seq)`` — membership
  rows from edge appends (props None), ``set_vertex_props`` delta
  rows raw. Same query-start schema pinning and colmap rule as the
  edge feed (a consumer restarted after schema evolution picks up
  the evolved schema — the Delta convention).
- **Batch form**: ``spark.read.format("gdb_commits")`` replays the
  retained history with the identical planner and skip rule, so
  backfill-then-tail composes without gaps or double counts.

Store path schemes (planning runs WITHOUT a SparkSession, so the
JVM-gateway HadoopFsManifestStore is out of reach here):

- plain POSIX path or ``file://…`` — :class:`PosixManifestStore` for
  manifests, local filesystem for data (the ``file://`` spelling
  exercises the exact scheme-resolution code path an object store
  uses, end-to-end in tests);
- ``s3://…`` / ``s3a://…`` — :class:`S3ManifestStore` (real
  conditional-put commit log) for manifests; executors open the data
  parquet through ``pyarrow.fs.FileSystem.from_uri`` (needs a
  pyarrow S3 build + credentials at the executors). Tests drive the
  planner against a fake S3 client (``S3_CLIENT_FACTORY`` below);
- other schemes (``hdfs://``, ``abfs://``) still raise loudly: their
  Python-side filesystem needs the JVM gateway the planner doesn't
  have — loud beats a confusing downstream listing error.

A consumed-then-vacuumed range raises FileNotFoundError instead of
silently skipping data — ``starting_seq`` lets a new consumer start
past vacuumed history.

Reference parity note: the reference has no streaming surface at all
(its server loop is request/response, ``primary_server.c``); this is
engine-native capability in Delta/Iceberg's direction.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from urllib.parse import unquote, urlparse

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)

_CORE = {"edges": "graph string, src int, dst int, w int",
         "vertices": "graph string, vid int"}

# Injection point for the S3 planner: a zero-arg callable returning a
# boto3-shaped client (put_object/get_object/delete_object/
# get_paginator). Production leaves it None (S3ManifestStore builds a
# real boto3 client); tests and custom endpoints (MinIO) set it.
S3_CLIENT_FACTORY: Callable[[], object] | None = None


def _open_manifest_log(path: str):
    """The store's manifest log, resolved from the path scheme — the
    ONE place the planner touches metadata, shared by schema
    resolution and both readers (so a concurrent schema change cannot
    make the pinned prop plan disagree with the query schema)."""
    from graphdatabase_spark.metastore import (ManifestLog,
                                               PosixManifestStore,
                                               S3ManifestStore)
    if path.startswith("file:"):
        path = urlparse(path).path or path[len("file:"):]
        return ManifestLog(
            PosixManifestStore(os.path.join(path, "manifests")))
    if path.startswith(("s3://", "s3a://")):
        u = urlparse(path)
        prefix = u.path.strip("/")
        key = (prefix + "/manifests") if prefix else "manifests"
        client = S3_CLIENT_FACTORY() if S3_CLIENT_FACTORY else None
        return ManifestLog(
            S3ManifestStore(u.netloc, prefix=key, client=client))
    if "://" in path:
        # hdfs:// / abfs:// reach their filesystem only through the
        # JVM gateway (HadoopFsManifestStore), which the Python data
        # source planner does not have. Loud beats a confusing
        # downstream listing error.
        raise NotImplementedError(
            f"gdb_commits: only local, file://, and s3:// store paths "
            f"are wired into the Python-data-source planner (got "
            f"{path!r}); hdfs://-family schemes need the JVM gateway")
    return ManifestLog(PosixManifestStore(os.path.join(path, "manifests")))


def _cids(ptr) -> list[str]:
    return list(ptr) if isinstance(ptr, list) else [ptr]


class CommitPartition(InputPartition):
    def __init__(self, store: str, cid: str, seq: int,
                 graphs: list[str], gb: int | None,
                 table: str = "edges",
                 prop_cols: list[tuple[str, str]] | None = None,
                 prop_types: list[str] | None = None):
        self.store = store
        self.cid = cid
        self.seq = seq
        self.graphs = graphs
        self.gb = gb
        self.table = table
        # declared props as (logical, physical) pairs in declaration
        # order — the colmap applied executor-side
        self.prop_cols = prop_cols or []
        # the props' declared DDL types (same order): lets the
        # executor build Arrow batches without a JVM to parse DDL
        self.prop_types = prop_types or []


def _table_props(doc: dict, table: str) -> list[tuple[str, str]]:
    """Declared props of ``table`` in manifest ``doc`` as (logical,
    physical) pairs in declaration order — RENAMEd columns read their
    original physical parquet column (the same colmap rule as
    GraphSnapshot reads)."""
    props = doc.get("props", {}).get(table, {})
    cmap = doc.get("colmap", {}).get(table, {})
    return [(n, cmap.get(n, n)) for n in props]


def _feed_schema(table: str, pcols: list[tuple[str, str]],
                 props: dict) -> str:
    """The change feed's DDL schema: core key columns + the declared
    props (logical names, declared types) + the publishing seq."""
    return (_CORE[table]
            + "".join(f", {n} {props[n]}" for n, _ in pcols)
            + ", seq int")


def _data_fs_uri(store: str) -> str:
    """The store URI as pyarrow's FileSystem.from_uri expects it:
    Hadoop's ``s3a://`` spelling normalized to ``s3://`` (pyarrow
    doesn't know the Hadoop scheme); everything else verbatim."""
    return ("s3://" + store[len("s3a://"):]
            if store.startswith("s3a://") else store)


# DDL scalar type → pyarrow type for the Arrow-batch fast path of
# ``read`` (guide §4: rows cross the Python boundary as Arrow batches,
# never as per-row pickled tuples). Executors and the planning worker
# have no JVM gateway, so Spark's DDL parser is out of reach — this
# covers the scalar vocabulary; a prop outside it (array/struct/
# timestamp) drops that partition to the always-correct tuple path.
_ARROW_TYPES = {
    "int": "int32", "integer": "int32", "bigint": "int64",
    "long": "int64", "smallint": "int16", "tinyint": "int8",
    "string": "string", "double": "float64", "float": "float32",
    "boolean": "bool", "date": "date32",
}


def _arrow_feed_schema(table: str, prop_cols: list[tuple[str, str]],
                       prop_types: list[str]):
    """The feed's Arrow schema (matching ``_feed_schema``'s DDL), or
    None when a prop type falls outside the scalar fast-path map."""
    import pyarrow as pa

    types = {"int32": pa.int32(), "int64": pa.int64(),
             "int16": pa.int16(), "int8": pa.int8(),
             "string": pa.string(), "float64": pa.float64(),
             "float32": pa.float32(), "bool": pa.bool_(),
             "date32": pa.date32()}
    core = ([("graph", pa.string()), ("vid", pa.int32())]
            if table == "vertices" else
            [("graph", pa.string()), ("src", pa.int32()),
             ("dst", pa.int32()), ("w", pa.int32())])
    fields = list(core)
    for (logical, _), ddl in zip(prop_cols, prop_types):
        key = _ARROW_TYPES.get(ddl.strip().lower())
        if key is None:
            return None
        fields.append((logical, types[key]))
    fields.append(("seq", pa.int32()))
    return pa.schema(fields)


def _open_commit_dataset(store: str, table: str, cid: str,
                         gb: int | None):
    """The pyarrow dataset of one commit dir, scheme-aware: POSIX
    paths use the local filesystem directly; scheme paths resolve
    their filesystem via ``pyarrow.fs.FileSystem.from_uri`` (s3a://
    normalized to s3://, which pyarrow understands). Returns None
    when this commit wrote no rows for this table."""
    import pyarrow.dataset as pads

    rel = f"data/{table}/c={cid}" + (f"/gb={gb}" if gb is not None else "")
    if "://" not in store and not store.startswith("file:"):
        path = os.path.join(store, *rel.split("/"))
        if not os.path.isdir(path):
            return None
        return pads.dataset(path, format="parquet", partitioning="hive")
    from pyarrow import fs as pafs
    fs, base = pafs.FileSystem.from_uri(_data_fs_uri(store))
    path = base.rstrip("/") + "/" + rel
    if fs.get_file_info(path).type == pafs.FileType.NotFound:
        return None
    return pads.dataset(path, format="parquet", partitioning="hive",
                        filesystem=fs)


class GraphStoreStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, log=None,
                 pcols: list[tuple[str, str]] | None = None,
                 props: dict | None = None):
        path = options.get("path")
        if not path:
            raise ValueError(
                "gdb_commits: .option('path', <store dir>) is required")
        self._store = path
        self._start = int(options.get("starting_seq", 0))
        self._table = options.get("table", "edges")
        if self._table not in ("edges", "vertices"):
            raise ValueError(
                f"gdb_commits: table must be 'edges' or 'vertices', "
                f"got {self._table!r}")
        # driver-side manifest access without a SparkSession — injected
        # by GraphStoreDataSource (ONE resolution shared with schema())
        # or resolved here for direct construction
        self._log = log if log is not None else _open_manifest_log(path)
        # the prop columns are pinned ONCE at query start, matching
        # the DataSource schema pinned at the same moment from the
        # SAME manifest load — NOT per micro-batch: a column declared
        # mid-stream must not widen later batches' rows beyond the
        # query's schema (restart the consumer to pick up evolved
        # schema, the Delta convention)
        if pcols is None or props is None:
            doc = self._log.load() or {}   # ONE load for both
            pcols = (pcols if pcols is not None
                     else _table_props(doc, self._table))
            props = (props if props is not None
                     else doc.get("props", {}).get(self._table, {}))
        self._pcols = pcols
        # the props' declared DDL types, same order as _pcols — ride
        # into every partition for the executor-side Arrow batches.
        # A prop missing from the declared-type map (stale pinned
        # pcols vs a reloaded manifest) is UNKNOWN, not "string":
        # the empty sentinel makes _arrow_feed_schema return None so
        # that partition takes the always-correct tuple fallback
        # instead of mis-casting to string and breaking the declared
        # feed schema at runtime.
        self._ptypes = [props.get(n, "") for n, _ in pcols]

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
                                        self._table, pcols, self._ptypes)
                        for gb, gs in sorted(by_gb.items()))
                else:
                    parts.append(
                        CommitPartition(self._store, cid, seq, graphs, None,
                                        self._table, pcols, self._ptypes))
            prev = cur
        return parts

    # -- executor read (no SparkSession: pyarrow over the commit dir) --

    def read(self, partition: CommitPartition):
        dset = _open_commit_dataset(partition.store, partition.table,
                                    partition.cid, partition.gb)
        if dset is None:
            return   # this commit wrote no rows for this table
        names = set(dset.schema.names)
        # physical prop columns present in THIS commit's files; absent
        # ones (commits predating the column) read None — the same
        # NULL-backfill rule as the snapshot scan
        phys = [p for _, p in partition.prop_cols]
        core = ["graph", "vid"] if partition.table == "vertices" \
            else ["graph", "src", "dst", "w"]
        cols = [c for c in core if c in names] + \
            [p for p in phys if p in names]
        schema = _arrow_feed_schema(partition.table, partition.prop_cols,
                                    partition.prop_types)
        if schema is not None:
            # Arrow fast path (guide §4): rows leave the Python worker
            # as RecordBatches — the per-row tuple/pickle loop removed.
            # Filtering, NULL-backfill, w-defaulting and casts are all
            # vectorized pyarrow kernels.
            import pyarrow as pa
            import pyarrow.compute as pc

            tbl = dset.to_table(columns=cols).combine_chunks()
            n = tbl.num_rows
            if n == 0:
                return
            # legacy layout (gb is None): graph is a hive partition
            # value Spark %-escaped at write (Hive's escapePathName)
            # — unquote it. Bucketed layout: graph is a plain data
            # column, taken verbatim (unquoting could mangle a name
            # that legitimately contains '%').
            garr = tbl.column("graph").cast(pa.string())
            if partition.gb is None:
                garr = pa.array([unquote(g) for g in garr.to_pylist()],
                                pa.string())
            arrays, out_names = [garr], ["graph"]
            for c in core[1:]:
                if c in tbl.column_names:
                    col = tbl.column(c)
                    if c == "w":
                        col = pc.fill_null(col, 1)
                elif c == "w":
                    col = pa.array([1] * n, pa.int32())
                else:
                    col = pa.nulls(n, pa.int32())
                arrays.append(col)
                out_names.append(c)
            for idx, (logical, p) in enumerate(partition.prop_cols):
                ftype = schema.field(len(core) + idx).type
                col = (tbl.column(p) if p in tbl.column_names
                       else pa.nulls(n, ftype))
                arrays.append(col)
                out_names.append(logical)
            arrays.append(pa.array([partition.seq] * n, pa.int32()))
            out_names.append("seq")
            out = (pa.table(arrays, names=out_names)
                   .filter(pc.is_in(garr, value_set=pa.array(
                       sorted(set(partition.graphs)), pa.string())))
                   .cast(schema))
            yield from out.to_batches()
            return
        # tuple fallback: a declared prop type outside the scalar map
        # (array/struct/timestamp) — row loop, always correct
        want = set(partition.graphs)
        for batch in dset.to_table(columns=cols).to_batches():
            d = batch.to_pydict()
            n = len(d[cols[0]])
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
                               *[d[p][i] if p in d else None
                                 for _, p in partition.prop_cols],
                               partition.seq)


class GraphStoreBatchReader(DataSourceReader):
    """The BATCH form of the same planner — ``spark.read.format(
    "gdb_commits")`` replays the whole retained chain history
    (``starting_seq`` .. latest) in one read: the backfill that seeds
    a consumer before it switches to tailing, with identical
    per-commit rows and the identical skip-rewrites rule, so
    backfill-then-tail composes without gaps or double counts."""

    def __init__(self, options: dict, log=None,
                 pcols: list[tuple[str, str]] | None = None,
                 props: dict | None = None):
        self._stream = GraphStoreStreamReader(options, log, pcols, props)

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

    def _resolved(self):
        """Manifest log + query-start prop plan, resolved ONCE per
        data source instance and shared by schema() and both readers:
        a declare_prop landing between two independent loads would
        otherwise let the pinned prop plan disagree with the query
        schema (wrong row arity for the whole run)."""
        if not hasattr(self, "_log"):
            path = self.options.get("path")
            if not path:
                raise ValueError(
                    "gdb_commits: .option('path', <store dir>) is "
                    "required")
            table = self.options.get("table", "edges")
            if table not in ("edges", "vertices"):
                raise ValueError(
                    f"gdb_commits: table must be 'edges' or "
                    f"'vertices', got {table!r}")
            self._log = _open_manifest_log(path)
            doc = self._log.load() or {}
            self._pcols = _table_props(doc, table)
            self._props = doc.get("props", {}).get(table, {})
            self._table = table
        return self._log, self._pcols

    def schema(self) -> str:
        # core key + the store's declared props (logical names) at
        # query start, + seq — pinned per run from the SAME manifest
        # load the readers use; a consumer restarted after schema
        # evolution picks up the evolved schema
        _, pcols = self._resolved()
        return _feed_schema(self._table, pcols, self._props)

    def streamReader(self, schema) -> GraphStoreStreamReader:
        log, pcols = self._resolved()
        return GraphStoreStreamReader(self.options, log, pcols, self._props)

    def reader(self, schema) -> GraphStoreBatchReader:
        log, pcols = self._resolved()
        return GraphStoreBatchReader(self.options, log, pcols, self._props)
