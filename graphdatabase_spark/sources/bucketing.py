"""Bucketed-table layout: the co-located join path.

A join between two large fact tables shuffles BOTH sides on every
query. When the same join key is hit repeatedly (orders ⋈ lineitem in
every revenue query; events self-joins in attribution), the 100 TB
answer is to pay the shuffle ONCE at write time: ``bucketBy(n, key)``
hash-partitions rows into a fixed bucket count recorded in the table
catalog, and Spark's planner then proves both sides of a same-key join
are already co-partitioned — the Exchange disappears from the plan
entirely (tests/test_io_and_plans.py pins this on the physical plan).

Sizing: bucket count is FIXED at write time — pick it for the target
table size (≈ table_bytes / desired_task_input, e.g. 100 TB at 256 MB
tasks → ~400k buckets is too many files; in practice 4k-32k buckets
with multiple files per bucket). Both join sides must use the same
bucket count (or a multiple, which Spark can coalesce since 3.1 —
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).

``sortBy`` within buckets additionally lets sort-merge joins skip
their sort when each bucket holds one file per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   num_buckets: int, sort: bool = True) -> None:
    """Materialize ``df`` as a bucketed parquet table registered in the
    session catalog (bucket metadata lives in the catalog — a plain
    ``read.parquet`` of the same files would NOT get bucketed-join
    planning)."""
    w = (df.write.format("parquet").mode("overwrite")
         .bucketBy(num_buckets, key))
    if sort:
        w = w.sortBy(key)
    w.option("path", path).saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (preserving the
    bucket-spec the join planner needs)."""
    return spark.table(table)
