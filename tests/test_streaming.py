"""Streaming: oracle parity for the batch forms, batch≡stream
equivalence through a real readStream→memory-sink run, and watermark
late-row-drop semantics on a controlled two-micro-batch input."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from graphdatabase_spark.streaming import streamops

from tests.parity import assert_parity

pytestmark = pytest.mark.slow  # heavyweight integration module: full-suite tier (pyproject.toml)


@pytest.mark.parametrize("name", sorted(streamops.QUERIES))
def test_streaming_batch_parity(spark, sf_dir, name):
    assert_parity(streamops.QUERIES[name](spark, sf_dir), streamops.ORACLES[name], sf_dir)


def _run_stream_to_memory(stream_df, query_name, output_mode="complete"):
    q = (stream_df.writeStream.format("memory").queryName(query_name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_tumbling_stream_equals_batch(spark, sf_dir):
    """The same transformation applied to readStream over the same
    parquet must converge to the batch answer (availableNow drains
    everything; complete mode emits the final state)."""
    name = f"tum_{uuid.uuid4().hex[:8]}"
    stream = streamops.tumbling_counts(
        streamops.events_stream(spark, sf_dir), watermark="1 hour")
    _run_stream_to_memory(stream, name)
    got = {tuple(r) for r in spark.table(name).collect()}
    want = {tuple(r) for r in
            streamops.tumbling_counts(streamops.events_batch(spark, sf_dir)).collect()}
    assert got == want


def test_session_stream_equals_batch(spark, sf_dir):
    """Native session_window streaming result == the gaps-and-islands
    batch plan (the oracle-checked form)."""
    name = f"sess_{uuid.uuid4().hex[:8]}"
    stream = streamops.session_stats_stream(streamops.events_stream(spark, sf_dir))
    _run_stream_to_memory(stream, name)
    got = {tuple(r) for r in spark.table(name).collect()}
    want = {tuple(r) for r in
            streamops.session_stats_batch(streamops.events_batch(spark, sf_dir)).collect()}
    assert got == want


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """The watermarked stream-stream interval join (purchase ⋈ views
    within 30 min) drained with availableNow must produce exactly the
    batch join's pairs — append mode: interval-join rows are final once
    both watermarks pass them."""
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    ev_stream = streamops.events_stream(spark, sf_dir)
    stream = streamops.purchases_with_views(
        ev_stream.filter(F.col("event_type") == "purchase"),
        ev_stream.filter(F.col("event_type") == "view"),
        watermark="1 hour")
    _run_stream_to_memory(stream, name, output_mode="append")
    got = {tuple(r) for r in spark.table(name).collect()}
    ev = streamops.events_batch(spark, sf_dir)
    want = {tuple(r) for r in streamops.purchases_with_views(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view")).collect()}
    assert got == want
    assert want, "batch join must be non-trivial"


def test_stream_dedup_equals_batch_keys(spark, sf_dir):
    """dropDuplicatesWithinWatermark keeps the first ARRIVAL per key
    (arrival order isn't event-time order), so the streaming and batch
    forms agree on the KEY SET — one surviving row per (bucket, user,
    type) — while the batch form is the deterministic-row ground truth
    the oracle checks."""
    name = f"dd_{uuid.uuid4().hex[:8]}"
    stream = streamops.dedup_events_stream(streamops.events_stream(spark, sf_dir))
    _run_stream_to_memory(stream, name, output_mode="append")
    got = {(r.bucket_start, r.user_id, r.event_type)
           for r in spark.table(name).collect()}
    want_rows = streamops.dedup_events_batch(
        streamops.events_batch(spark, sf_dir)).collect()
    want = {(r.bucket_start, r.user_id, r.event_type) for r in want_rows}
    assert got == want
    assert len(got) < sum(r.n_copies for r in want_rows), \
        "dedup must actually collapse copies in this data"


def test_trending_stream_foreachbatch_equals_batch(spark, sf_dir):
    """Streaming top-k pattern: the COUNT aggregation runs
    incrementally (complete mode drains to the final state); the rank
    is applied to the emitted aggregate — here via the memory-sink
    table, exactly what a foreachBatch sink does per micro-batch. Final
    ranked rows must equal the batch trending_topk answer."""
    from pyspark.sql.window import Window

    name = f"tr_{uuid.uuid4().hex[:8]}"
    counts = (streamops.events_stream(spark, sf_dir)
              .withWatermark("ts", "1 hour")
              .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n_events")))
    _run_stream_to_memory(counts, name)
    rk = Window.partitionBy("w").orderBy(F.desc("n_events"), F.asc("event_type"))
    ranked = (spark.table(name).withColumn("rk", F.row_number().over(rk))
              .filter(F.col("rk") <= streamops.TRENDING_K)
              .select(F.col("w.start").alias("window_start"), "event_type",
                      "n_events", F.col("rk").cast("int").alias("rk")))
    got = {tuple(r) for r in ranked.collect()}
    want = {tuple(r) for r in
            streamops.trending_topk(streamops.events_batch(spark, sf_dir)).collect()}
    assert got == want


def test_watermark_drops_late_rows(spark, tmp_path):
    """Watermark semantics pinned with two availableNow runs sharing a
    checkpoint (the watermark is persisted in the offset log between
    runs, exactly like a restarted production job): run 2 delivers one
    row far older than (max seen ts - watermark) and it must be
    dropped from its already-emitted window."""
    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "ts timestamp, v int"

    def write_batch(fname, rows):
        df = spark.createDataFrame(rows, schema).repartition(1)
        df.write.mode("overwrite").parquet(str(tmp_path / "tmp_batch"))
        import glob
        import shutil
        part = glob.glob(str(tmp_path / "tmp_batch" / "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, fname))

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    out = str(tmp_path / "out")

    def run_once():
        # memory sinks can't recover from a checkpoint; a file sink can —
        # and it's also the realistic restart scenario.
        stream_df = (
            spark.readStream.schema(schema).parquet(src)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.sum("v").alias("sv"))
            .select(F.col("w.start").alias("ws"), "sv")
        )
        q = (stream_df.writeStream.format("parquet").option("path", out)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = {}
        for r in spark.read.parquet(out).collect():
            rows.setdefault(r["ws"], []).append(r["sv"])
        return rows

    # run 1: fills window [00:00, 00:10) and advances the event clock
    # to 01:00 → watermark persisted as 00:50, window emitted closed
    write_batch("b1.parquet", [(ts(1), 1), (ts(5), 1), (ts(60), 1)])
    first = run_once()
    assert first.get(t0) == [2], f"window must close with on-time rows only, got {first}"

    # run 2: one row at 00:02 — older than the persisted watermark —
    # plus an on-time row; the late row must not resurrect the window
    write_batch("b2.parquet", [(ts(2), 100), (ts(120), 1)])
    second = run_once()
    assert second.get(t0) == [2], f"late row must be dropped, got {second}"
    assert second.get(ts(60)) == [1], f"on-time window must emit, got {second}"
