"""Custom stateful streaming operator via ``applyInPandasWithState``
(the brief's designated tool for operators Structured Streaming lacks
as built-ins).

``running_user_stats``: per-user running aggregate maintained across
micro-batches — total events, running decimal-exact value sum, last
event time. Unlike a windowed agg, state here never expires by
watermark; it is the "online profile" shape (per-entity accumulators
updated forever) that real pipelines keep next to their event streams.

Scale notes: state is partitioned by the grouping key across the
cluster's state store (RocksDB-backed in production configs); each
micro-batch shuffles only that batch's rows to their key's partition.
The handler sees Arrow batches per key — no per-row Python overhead.
State timeout is wired (``GroupStateTimeout``) but NoTimeout here:
profiles are permanent.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType, TimestampType,
)

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("sum_cents", LongType()),   # exact integer accumulation
    StructField("last_us", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
    StructField("last_ts", TimestampType()),
])


def _cents_half_up(values: pd.Series) -> int:
    """Sum of round-half-AWAY-FROM-ZERO integer cents over non-null
    values — the exact semantics of Spark's F.round (BigDecimal
    HALF_UP) in the batch ground truth and round() in the DuckDB
    oracle; pandas .round() is banker's rounding and would put
    streaming one cent off the batch answer.

    Hot path is vectorized int64 math on floor(|100x| + 0.5): that is
    exactly HALF_UP whenever 100x sits safely away from a .5-cent
    boundary. Only values whose fractional cent is within a float-error
    tolerance of .5 (where the vectorized add could cross the tie the
    true decimal value never reaches), or too large for exact float
    cents, fall back to the per-value Decimal(repr(x)) form — in real
    data that is ~the actual half-cent ties, so the streaming hot path
    stays batch-speed without giving up the one-cent exactness."""
    v = values.dropna()
    if not len(v):
        return 0
    xs = v.to_numpy(dtype="float64")
    y = xs * 100.0
    a = np.abs(y)
    frac = a - np.floor(a)
    # tolerance covers the multiply-by-100 + add-0.5 float error with
    # orders-of-magnitude headroom; 2^50 guards cents that no longer
    # round-trip exactly through float64
    risky = (np.abs(frac - 0.5) <= 1e-7 + 1e-13 * a) | (a >= 2.0**50)
    fast = np.floor(a[~risky] + 0.5) * np.sign(y[~risky])
    total = int(fast.astype("int64").sum())
    total += sum(
        int(Decimal(repr(float(x))).scaleb(2).quantize(Decimal(1), ROUND_HALF_UP))
        for x in xs[risky])
    return total


def _update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # nulls are skipped exactly like the batch aggregate (the row
        # still counts toward n_events)
        cents += _cents_half_up(pdf["value"])
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, cents, last_us))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "sum_value": [cents / 100.0],
        "last_ts": [pd.Timestamp(last_us, unit="us")],
    })


def running_user_stats(events: DataFrame, output_mode: str = "update") -> DataFrame:
    """Apply to a *streaming* events DataFrame; emits the updated
    profile row for every user touched by each micro-batch.

    ``output_mode`` must match the sink's mode ("update" for
    memory/console, "append" for file sinks — the emitted rows are the
    same either way; the handler decides what to yield)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update, OUTPUT_SCHEMA, STATE_SCHEMA,
            outputMode=output_mode, timeoutConf=GroupStateTimeout.NoTimeout)
    )


def running_user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch ground truth for the final state after the whole stream."""
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("sum_value"),
             F.max("ts").alias("last_ts"))
    )


def q_running_user_stats(spark, sf_dir: str) -> DataFrame:
    """Driver entry: the batch form of the stateful operator's final
    state (the streaming form is pinned equal to it by
    tests/test_stateful.py, including state carry-over across
    restarts)."""
    from graphdatabase_spark.streaming.streamops import events_batch

    return running_user_stats_batch(events_batch(spark, sf_dir))


ORACLE_RUNNING_USER_STATS = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
       MAX(ts) AS last_ts
FROM events
GROUP BY user_id
"""


QUERIES = {"running_user_stats": q_running_user_stats}
ORACLES = {"running_user_stats": ORACLE_RUNNING_USER_STATS}
