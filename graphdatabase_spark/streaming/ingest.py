"""Structured Streaming ingest into the versioned graph store.

The reference's write path is a blocking request loop: a client ships a
whole adjacency matrix, the primary takes the graph's write lock,
overwrites state, replies (``primary_server.c:110-146,223``). The
Spark-first equivalent of "graphs keep arriving" is a STREAM feeding
the same manifest-committed store the batch writers use:

    readStream (files / Kafka / rate) --map to (graph, src, dst, w)-->
    writeStream.foreachBatch --> GraphEngine.append_edges

Each micro-batch lands as ONE append commit (engine.py): data dirs are
immutable parquet under ``c=<cid>``, the manifest CAS-extends each
touched graph's commit chain, and batch readers see every micro-batch
atomically or not at all — streaming and batch writers interleave
safely because they share the same optimistic commit protocol.

Exactly-once: foreachBatch is at-least-once (a batch replays after a
failure between the sink call and the checkpoint write). The sink
passes ``append_edges`` a transaction identity — app = a hash of the
checkpoint location (the sink's identity), version = the batch id —
which the manifest records in its ``txns`` map and every later commit
(including compact/merge) carries forward. A replayed batch whose
version is already recorded rewrites its (identical, immutable) data
dirs and publishes nothing — even if a concurrent compaction collapsed
the append chain in the replay window, which is exactly the case a
commit-id-referenced check alone missed. This is the Delta streaming
sink's txn-appId/version dedup, expressed over the manifest log; the
deterministic commit id is kept as well so replayed data dirs land on
the same immutable path instead of orphaning a new one.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

__all__ = ["stream_edges_into_store", "batch_commit_id"]


def batch_commit_id(checkpoint_dir: str, batch_id: int) -> str:
    """Deterministic commit id for a (sink, micro-batch) pair: the
    checkpoint location IS the sink's identity (two streams into the
    same store have different checkpoints, so their batch 0s never
    collide), and replays of batch N reproduce the same id."""
    sink = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:6]
    return f"s{sink}{batch_id:08d}"


def stream_edges_into_store(edge_stream: DataFrame, engine,
                            checkpoint_dir: str,
                            available_now: bool = True):
    """Run a streaming query appending ``edge_stream`` — a STREAMING
    DataFrame with columns ``(graph, src, dst[, w])`` — into
    ``engine``'s store, one append commit per micro-batch. Returns the
    started ``StreamingQuery`` (call ``awaitTermination()``;
    ``available_now=True`` drains what's available then stops, the
    batch-parity trigger; False runs continuously).

    Scale shape: the per-batch work is two narrow projections + one
    anti-join pruned to the batch's graphs — O(batch), not O(store) —
    and the commit is one manifest CAS. State (which files were
    consumed) lives in the checkpoint; the store's own idempotency
    guard covers the replay window the checkpoint can't."""

    sink_app = "ckpt-" + hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        engine.append_edges(batch_df,
                            commit_id=batch_commit_id(checkpoint_dir,
                                                      batch_id),
                            txn_app=sink_app, txn_version=batch_id)

    writer = (edge_stream.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir)
              .queryName("graph-store-ingest"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
