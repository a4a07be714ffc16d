"""Custom stateful streaming operator (applyInPandasWithState): the
final per-user state after draining the stream must equal the batch
ground truth; multi-batch state carry-over is exercised via two
availableNow runs over a shared checkpoint."""

import uuid

from graphdatabase_spark.streaming import stateful, streamops
import pytest

pytestmark = pytest.mark.slow  # heavyweight integration module: full-suite tier (pyproject.toml)


def test_stateful_running_stats_converges_to_batch(spark, sf_dir):
    name = f"st_{uuid.uuid4().hex[:8]}"
    out = stateful.running_user_stats(streamops.events_stream(spark, sf_dir))
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # update mode may emit several rows per user (one per micro-batch);
    # the final state is the row with the max n_events per user
    rows = spark.table(name).collect()
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    got = {u: (r["n_events"], r["sum_value"], r["last_ts"]) for u, r in final.items()}
    want = {r["user_id"]: (r["n_events"], r["sum_value"], r["last_ts"])
            for r in stateful.running_user_stats_batch(
                streamops.events_batch(spark, sf_dir)).collect()}
    assert got == want


def test_cents_half_up_matches_decimal_reference():
    """The vectorized fast path + Decimal fallback must agree with the
    pure-Decimal reference on adversarial values: exact half-cent ties
    (away-from-zero, both signs), values one float-ulp below a tie
    (2.675's float is 2.67499999...; Decimal-on-repr says 268), bulk
    ordinary values, nulls, and empties."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    def ref(vals):
        return sum(int(Decimal(repr(float(x))).scaleb(2).quantize(
            Decimal(1), ROUND_HALF_UP)) for x in vals if not pd.isna(x))

    cases = [
        [0.125, -0.125, 2.675, -2.675, 0.005, -0.005],  # ties / repr traps
        [1.0, 2.34, -7.89, 0.0, -0.0, 123456.78],
        [None, 1.115, float("nan"), -1.115],
        [],
        list(np.linspace(-10, 10, 1001)),  # includes many .x5 boundaries
    ]
    for vals in cases:
        s = pd.Series(vals, dtype="float64")
        assert stateful._cents_half_up(s) == ref(vals), vals


def test_state_carries_across_restarts(spark, tmp_path):
    """Write two micro-batch files processed by two separate
    availableNow runs over one checkpoint: counts in run 2 must include
    run 1's state."""
    import datetime as dt

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "outdir")
    import glob
    import os
    import shutil
    os.makedirs(src)
    schema = "user_id long, ts timestamp, value double"
    t0 = dt.datetime(2024, 1, 1)

    def write_file(fname, rows):
        df = spark.createDataFrame(rows, schema).repartition(1)
        df.write.mode("overwrite").parquet(str(tmp_path / "tmp"))
        shutil.copy(glob.glob(str(tmp_path / "tmp" / "part-*.parquet"))[0],
                    os.path.join(src, fname))

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (stateful.running_user_stats(stream, output_mode="append")
             .writeStream.format("parquet").option("path", out_dir)
             .outputMode("append")  # file sink requires append; rows still emit per batch
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    write_file("b1.parquet", [(7, t0, 1.0), (7, t0, 2.0)])
    run_once()
    write_file("b2.parquet", [(7, t0, 0.5)])
    run_once()
    rows = sorted(((r["n_events"], r["sum_value"]) for r in
                   spark.read.parquet(out_dir).collect()))
    # run 1 emitted (2, 3.0); run 2 must continue from state: (3, 3.5)
    assert rows == [(2, 3.0), (3, 3.5)]
