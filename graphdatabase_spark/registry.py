"""Central query registry: every implemented operator's query builder
and (where SQL-expressible) its DuckDB oracle.

This is what ``__spark_entry__.py`` exposes to the driver. Domain
modules each contribute a ``QUERIES`` dict (query-id → callable
``(spark, sf_dir) -> DataFrame``) and an ``ORACLES`` dict (query-id →
ANSI SQL string). Query-ids follow SURVEY.md §2.3's inventory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graphdatabase_spark import cache
from graphdatabase_spark.functions import corpus, dedup, multimodal, similarity, text
from graphdatabase_spark.operators import graph_queries, relational, sqlapi, temporal
from graphdatabase_spark.streaming import stateful, streamops

_MODULES = [relational, graph_queries, text, dedup, similarity, streamops, multimodal,
            temporal, stateful, sqlapi, corpus]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        dup = set(out) & set(mod.QUERIES)
        if dup:
            raise ValueError(f"duplicate query ids {sorted(dup)} from {mod.__name__}")
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out


def release() -> int:
    """Free every session-shared / tracked cache the queries built
    (shingle index, MinHash signatures, LSH buckets, triangle-count
    temporaries). Returns the number of DataFrames unpersisted; queries
    re-run after release rebuild what they need."""
    return cache.release_caches()
