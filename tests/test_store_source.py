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
    assert got == [("A", 1, 2, 5, 1)]


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
