"""Source/sink coverage beyond the parquet catalog (SURVEY.md §2.3
"scan/sinks" family): ORC, CSV, JSON-lines, and text, with explicit
schemas and scale-sane defaults.

Conventions:

- **Schemas are always explicit** on read. Inference (`inferSchema`,
  `spark.read.json` schema sampling) costs a full extra pass over the
  data at 100 TB and can silently drift types between runs; an engine's
  catalog declares types once.
- **Writes default to zstd-compressed** (session default for parquet;
  explicit codec for text formats) and go through a single
  ``DataFrameWriter`` path so partitioning/mode conventions stay in one
  place.
- CSV/JSON are *exchange* formats here — the engine's own storage is
  partitioned parquet (``engine.GraphEngine``); these exist so data can
  enter and leave the system without a side trip through pandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CSV_READ_DEFAULTS = {
    "header": "true",
    "mode": "FAILFAST",        # a malformed row is a data bug, not a warning
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]",
}

JSON_READ_DEFAULTS = {
    "mode": "FAILFAST",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]",
}


def read_csv(spark: SparkSession, path: str, schema: StructType | str,
             **options: str) -> DataFrame:
    opts = {**CSV_READ_DEFAULTS, **options}
    return spark.read.schema(schema).options(**opts).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str,
              **options: str) -> DataFrame:
    opts = {**JSON_READ_DEFAULTS, **options}
    return spark.read.schema(schema).options(**opts).json(path)


def read_text(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    return spark.read.text(path, wholetext=wholetext)


def read_orc(spark: SparkSession, path: str,
             schema: StructType | str | None = None, **options: str) -> DataFrame:
    """ORC scan (columnar alternative ingest format; schema optional —
    ORC is self-describing like parquet, pass one to pin types)."""
    r = spark.read.options(**options)
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None, **options: str) -> None:
    w = df.write.mode(mode).options(header="true", compression="gzip", **options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite",
               partition_by: list[str] | None = None, **options: str) -> None:
    w = df.write.mode(mode).options(compression="gzip", **options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None, **options: str) -> None:
    w = df.write.mode(mode).options(compression="zstd", **options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None,
                  max_records_per_file: int | None = None) -> None:
    """Parquet sink; ``max_records_per_file`` bounds file size so a
    skewed partition can't produce a multi-GB file (small-file/huge-file
    balance is the operational knob at 100 TB)."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
