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


def _update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # Round half-AWAY-FROM-ZERO to integer cents via Decimal on the
        # double's shortest repr — the exact semantics of Spark's
        # F.round (BigDecimal HALF_UP) in the batch ground truth and
        # round() in the DuckDB oracle. Vectorized float tricks like
        # floor(abs(x)+0.5) diverge one ulp below a .5 boundary (the FP
        # add rounds up to the tie the true value never reaches), and
        # pandas .round() is banker's rounding — either would put
        # streaming one cent off the batch answer on adversarial
        # values. sum() skips nulls exactly like the batch aggregate
        # (the row still counts toward n_events).
        cents += sum(
            int(Decimal(repr(x)).scaleb(2).quantize(Decimal(1), ROUND_HALF_UP))
            for x in pdf["value"].dropna())
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
