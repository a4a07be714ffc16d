"""Parquet table catalog over the driver-provided testdata layout.

One parquet file per table under ``<sf_dir>/<name>.parquet``
(TESTDATA.md). At 100 TB each "file" becomes a partitioned parquet
dataset/table; nothing here assumes single-file layout —
``spark.read.parquet`` takes directories the same way. Column pruning
and predicate pushdown are Catalyst's job: every query in this package
selects only the columns it needs so ``ReadSchema``/``PushedFilters``
stay narrow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str,
               spread: bool = False) -> DataFrame:
    """Load one catalog table.

    ``spread=True`` repartitions the scan to the session's default
    parallelism. Use it for pipelines whose per-row compute dwarfs the
    scan (shingling, hashing, per-char n-grams): a small parquet file is
    one row group ⇒ one task, which serializes the whole pipeline on a
    single core no matter how wide the cluster. The reshuffle moves only
    the raw rows (cheap) and buys full-width execution of the expensive
    expressions. Plain scans skip it — Catalyst's split planning already
    parallelizes IO-bound work.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Caller-supplied sessions (the correctness driver, notebooks) don't
    # have the engine's session defaults; this one is runtime-settable
    # and load_table is the common entry of every query path. Without it
    # AQE can't coalesce partitions under .persist(), so the iterative
    # kernels' cached intermediates run every stage at the configured
    # shuffle partition count (200 by default) whatever the data size —
    # measured 7x on the triangle kernel in a vanilla session.
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    # events.parquet carries TIMESTAMP(NANOS): pyspark >= 4.1 reads it
    # natively (µs-truncated TIMESTAMP_NTZ); older readers surface a
    # nanosecond long under spark.sql.legacy.parquet.nanosAsLong. Every
    # consumer goes through streamops._with_event_ts, which dispatches
    # on the observed dtype, so any caller-supplied session works.
    df = spark.read.parquet(table_path(sf_dir, name))
    df = _canonical_timestamps(df)
    if spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _canonical_timestamps(df: DataFrame) -> DataFrame:
    """Re-anchor any TIMESTAMP_LTZ column to the stored UTC wall clock
    as TIMESTAMP_NTZ.

    The driver tables store naive (isAdjustedToUTC=false) timestamps;
    default sessions already read them as NTZ and this is a no-op. A
    session with ``spark.sql.parquet.inferTimestampNTZ.enabled=false``
    reads them as LTZ instead, where both timestamp literals in query
    text and LTZ→NTZ casts are interpreted in the session timezone — a
    non-UTC caller session would silently shift every timestamp against
    the DuckDB oracle's naive read. Epoch-micros re-anchoring is
    timezone-independent (same treatment streamops._with_event_ts gives
    the events table, generalized to every table/column)."""
    ltz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampType)]
    for c in ltz:
        df = df.withColumn(c, F.expr(
            f"timestampadd(MICROSECOND, unix_micros({c}), timestamp_ntz'1970-01-01 00:00:00')"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
