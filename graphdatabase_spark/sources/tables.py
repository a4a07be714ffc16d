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

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
