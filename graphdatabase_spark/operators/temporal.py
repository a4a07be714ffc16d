"""Temporal join operators Spark lacks as built-ins: as-of join and
range (interval) join. SURVEY.md §2.3 north-star extensions; the
reference has no temporal surface at all (§2.3 statement of absence).

Both are implemented as *compositions of built-in operators* (the (a)
strategy from the build brief) — no UDFs, no mapInPandas:

- **As-of join** (latest right row with ``r.ts <= l.ts`` per key):
  union the two sides with a side tag, one window pass carries the
  last right payload forward, filter back to left rows. ONE shuffle on
  (key) — never a per-row range scan, never a cross product. This is
  the standard log-merge formulation; at 100 TB it shuffles each side
  once, identical to what a sort-merge join would move.
- **Range join** (all pairs with ``|l.ts - r.ts| <= width`` per key):
  equi-join on (key, time_bucket) with the right side exploded to its
  ±1 neighbor buckets, then the exact predicate. Bucketing turns an
  inequality join (which Spark executes as BNLJ = quadratic) into an
  equi shuffle join with a 3× fan-out — the candidate set per row is
  bounded by bucket population, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphdatabase_spark.streaming.streamops import events_batch


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              payload_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with ``right.ts <= left.ts`` and equal ``key`` (backward-inclusive
    as-of semantics, ties broken right-row-first so a same-instant
    right row matches)."""
    lcols = left.columns
    ldtypes = dict(left.dtypes)
    tagged_l = left.select(*lcols).withColumn("__side", F.lit(1)) \
        .withColumn("__p", F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in payload_cols) + ">"))
    tagged_r = right.select(
        F.col(key), F.col(ts),
        *[F.lit(None).cast(ldtypes[c]).alias(c) for c in lcols if c not in (key, ts)],
        F.lit(0).alias("__side"),
        F.struct(*payload_cols).alias("__p"),
    ).select(*lcols, "__side", "__p")
    merged = tagged_l.unionByName(tagged_r)
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col("__side").asc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = merged.withColumn("__last", F.last(F.when(F.col("__side") == 0, F.col("__p")),
                                                 ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__last.{c}").alias(c + suffix) for c in payload_cols])
    return out


def range_join(left: DataFrame, right: DataFrame, key: str, ts: str,
               width_sec: int, right_cols: list[str]) -> DataFrame:
    """All (left, right) pairs with equal key and
    ``|left.ts - right.ts| <= width_sec``, as an equi-join on
    (key, bucket) with ±1-bucket fan-out of the right side."""
    bucket = lambda c: F.floor(F.unix_micros(c) / (width_sec * 1_000_000))  # noqa: E731
    l = left.withColumn("__b", bucket(F.col(ts)))
    r = right.select(
        F.col(key).alias("__rk"), F.col(ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    ).withColumn("__b", F.explode(F.array(
        bucket(F.col("__rts")) - 1, bucket(F.col("__rts")), bucket(F.col("__rts")) + 1)))
    joined = l.join(r, (F.col(key) == F.col("__rk")) & (l["__b"] == r["__b"]))
    exact = joined.filter(
        F.abs(F.unix_micros(F.col(ts)) - F.unix_micros(F.col("__rts"))) <= width_sec * 1_000_000)
    return exact.select(*left.columns, F.col("__rts"),
                        *[F.col(f"__r_{c}").alias(f"r_{c}") for c in right_cols]) \
        .drop("__b")


# --- registry queries over events ------------------------------------------

ASOF_WIDTH_SEC = 1800


def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: ts and value of the user's most recent 'error' event
    at-or-before it (classic point-in-time enrichment)."""
    ev = events_batch(spark, sf_dir).select("event_id", "user_id", "ts", "event_type", "value")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    out = asof_join(
        ev.select("event_id", "user_id", "ts"), errors,
        key="user_id", ts="ts", payload_cols=["value"])
    return out.select("event_id", "user_id", "ts", F.col("value_asof").alias("last_error_value"))


# DuckDB has native ASOF JOIN (inclusive >=): the perfect oracle.
# A same-instant error event matches itself in both engines.
ORACLE_ASOF_JOIN_EVENTS = """
SELECT l.event_id, l.user_id, l.ts, r.value AS last_error_value
FROM events l
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs (view event, click event of the same user within
    ±ASOF_WIDTH_SEC): the co-occurrence primitive behind attribution
    windows."""
    ev = events_batch(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"))
    out = range_join(views, clicks, key="user_id", ts="ts",
                     width_sec=ASOF_WIDTH_SEC, right_cols=["click_id"])
    return out.select("event_id", "user_id", F.col("r_click_id").alias("click_id"),
                      (F.unix_micros("__rts") - F.unix_micros("ts")).alias("dt_us"))


ORACLE_RANGE_JOIN_EVENTS = f"""
SELECT v.event_id, v.user_id, c.event_id AS click_id,
       epoch_us(c.ts) - epoch_us(v.ts) AS dt_us
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND abs(epoch_us(c.ts) - epoch_us(v.ts)) <= {ASOF_WIDTH_SEC * 1_000_000}
"""


QUERIES = {
    "asof_join_events": q_asof_join_events,
    "range_join_events": q_range_join_events,
}

ORACLES = {
    "asof_join_events": ORACLE_ASOF_JOIN_EVENTS,
    "range_join_events": ORACLE_RANGE_JOIN_EVENTS,
}
