"""Streaming operators over the ``events`` table (SURVEY.md §2.3
"streaming variants"; §7 step 7).

Design: every windowed aggregation is ONE transformation function that
takes an events DataFrame — batch or streaming — and returns the same
logical plan. The registry exposes the batch application (that is what
the DuckDB oracle checks: late-data-free ground truth); the unit tests
apply the identical function to a ``readStream`` source with an
``availableNow`` trigger and a memory sink and assert the results
converge to the batch answer. Watermark semantics (late-row dropping)
are pinned by a separate fixed-input test, not by the oracle — the
reference has no streaming surface at all (SURVEY.md §2.3), so these
are north-star extensions.

Scale notes: tumbling/sliding aggregations are hash aggs keyed on
(window, event_type) — map-side combined, one shuffle, and state in a
real stream is bounded by watermark eviction. ``session_window`` uses
Spark's native session-merging state store; the batch equivalent is the
gaps-and-islands plan (lag + running flag-sum), whose shuffle is one
repartition by user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType
from pyspark.sql.window import Window

from graphdatabase_spark.sources.tables import _canonical_timestamps, load_table

# Microseconds since epoch for a (canonical NTZ) event timestamp.
# ``unix_micros`` only accepts TIMESTAMP_LTZ, so the ntz-safe spelling
# is a diff against the epoch literal — same codegen, no tz dependence.
_EPOCH_NTZ = "timestamp_ntz'1970-01-01 00:00:00'"


def event_us(c: F.Column | str) -> F.Column:
    """Epoch-microseconds of an event ``ts`` column (NTZ-safe)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), col)

SESSION_GAP = "15 minutes"
SESSION_GAP_SEC = 15 * 60
WATERMARK = "1 hour"


def _with_event_ts(events_raw: DataFrame) -> DataFrame:
    """Canonicalize the events ``ts`` column across parquet readers.

    The events table stores ts as TIMESTAMP(NANOS). How that surfaces
    depends on the Spark version and session confs:

    - pyspark >= 4.1 reads it natively, truncated to microseconds, as
      TIMESTAMP_NTZ (or TIMESTAMP_LTZ when
      ``spark.sql.parquet.inferTimestampNTZ.enabled=false``) — pass
      through unchanged;
    - older readers only surface it as a nanosecond long under
      ``spark.sql.legacy.parquet.nanosAsLong`` — truncate to
      microseconds ourselves.

    Truncation toward zero equals DuckDB's ns→µs handling for these
    (positive-epoch) instants, so both engines see identical values.
    Dispatching on the observed dtype (not on session conf) keeps every
    caller-supplied session working, including the correctness driver's
    plain session."""
    dt = events_raw.schema["ts"].dataType
    if isinstance(dt, LongType):
        return events_raw.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, timestamp_ntz'1970-01-01 00:00:00')"),
        )
    if isinstance(dt, TimestampType):
        # LTZ input: defense-in-depth for caller-built DataFrames —
        # load_table already re-anchors LTZ reads, so this branch only
        # fires for events frames that bypassed it. One shared
        # implementation of the timezone-independent re-anchoring.
        return _canonical_timestamps(events_raw)
    return events_raw


def events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_event_ts(load_table(spark, sf_dir, "events"))


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same table as an unbounded source (file stream; each parquet
    file is one micro-batch input split).

    Event-time watermarks only accept TIMESTAMP_LTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so the streaming source
    converts the canonical NTZ wall clock to the instant it denotes
    under UTC via epoch-micros re-anchoring. A plain NTZ→LTZ *cast*
    would read the wall clock in the session timezone — non-uniform
    across a DST transition (nonexistent/ambiguous local times can
    shift inter-event gaps and window assignment). The epoch-anchored
    form is timezone- and DST-independent, and identical to the cast in
    the engine's default UTC sessions; in a non-UTC session the column
    merely *renders* in that zone while instants, gaps, and windows
    stay unchanged."""
    raw_schema = load_table(spark, sf_dir, "events").schema
    # The file source wants a directory; point it at sf_dir and glob
    # the one table (a production layout is a directory of files).
    stream = _with_event_ts(
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    # timestamp_micros() produces TIMESTAMP_LTZ explicitly —
    # cast("timestamp") would follow spark.sql.timestampType (NTZ in
    # some sessions), and watermarks accept only LTZ.
    return stream.withColumn("ts", F.timestamp_micros(event_us(F.col("ts"))))


# --- tumbling window -------------------------------------------------------

def tumbling_counts(events: DataFrame, size: str = "1 hour",
                    watermark: str | None = None) -> DataFrame:
    """Count + decimal-exact value sum per (1h tumbling window, type)."""
    ev = events.withWatermark("ts", watermark) if watermark else events
    return (
        ev.groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             # decimal accumulation (exact, order-independent), double out
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def q_events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(events_batch(spark, sf_dir))


ORACLE_EVENTS_TUMBLING_COUNTS = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


# --- sliding window --------------------------------------------------------

def sliding_avg(events: DataFrame, size: str = "1 hour", slide: str = "30 minutes",
                watermark: str | None = None) -> DataFrame:
    """Per (sliding window, type): event count and decimal-exact mean."""
    ev = events.withWatermark("ts", watermark) if watermark else events
    return (
        ev.groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events",
            # exact decimal sum → double, then IEEE division: identical
            # in both engines (decimal division precision rules differ)
            (F.col("sv").cast("double") / F.col("n_events")).alias("avg_value"),
        )
    )


def q_events_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_avg(events_batch(spark, sf_dir))


# An event at t belongs to the two 1h/30m windows starting at
# time_bucket_30m(t) and 30 minutes earlier.
ORACLE_EVENTS_SLIDING_AVG = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes' AS window_start,
         event_type, value
  FROM events, unnest([0, 1]) AS t(o)
)
SELECT window_start, event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
FROM expanded
GROUP BY 1, 2
"""


# --- session windows -------------------------------------------------------

def session_stats_stream(events: DataFrame, gap: str = SESSION_GAP,
                         watermark: str = WATERMARK) -> DataFrame:
    """Native streaming session windows (merge-on-gap state store)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
    )


def session_stats_batch(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Batch gaps-and-islands equivalent of ``session_window``: a new
    session starts when the gap to the previous event of the same user
    exceeds ``gap_sec``; session_end = last event + gap (Spark's
    definition). One shuffle (repartition by user for the lag window),
    then a hash agg on (user, session id)."""
    by_user = Window.partitionBy("user_id").orderBy("ts")
    gap_us = gap_sec * 1_000_000
    flagged = events.select(
        "user_id", "ts",
        (F.coalesce(
            F.timestamp_diff("MICROSECOND", F.lag("ts").over(by_user), F.col("ts")) > gap_us,
            F.lit(True),
        )).cast("int").alias("is_new"),
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(
        by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"),
             F.timestamp_add("MICROSECOND", F.lit(gap_us), F.max("ts")).alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "session_start", "session_end", "n_events")
    )


def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_stats_batch(events_batch(spark, sf_dir))


ORACLE_EVENTS_SESSIONIZATION = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > {SESSION_GAP_SEC * 1_000_000}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start,
       make_timestamp(epoch_us(MAX(ts)) + {SESSION_GAP_SEC * 1_000_000}) AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


# --- JSON props extraction (scalar streaming transform) --------------------

def enriched_events(events: DataFrame) -> DataFrame:
    """Stateless enrichment usable identically in batch and streaming:
    JSON prop extraction + derived columns (stays whole-stage codegen)."""
    return events.select(
        "event_id", "user_id", "event_type", "ts",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.date_trunc("hour", F.col("ts")).alias("ts_hour"),
        (F.col("value") > 10.0).alias("high_value"),
    )


def q_events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enriched_events(events_batch(spark, sf_dir))


ORACLE_EVENTS_ENRICHED = """
SELECT event_id, user_id, event_type, ts,
       CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
       date_trunc('hour', ts) AS ts_hour,
       value > 10.0 AS high_value
FROM events
"""


# --- hypertable-style rollup (continuous aggregate) -------------------------

def hourly_partials(events: DataFrame) -> DataFrame:
    """The materialized hourly aggregate a hypertable keeps: decimal
    partials so any coarser rollup re-aggregates exactly."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_dec")
    )


def q_events_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily aggregate computed FROM the hourly partials — the
    continuous-aggregate/hypertable pattern: the day query reads 24
    partial rows per (day, type), never the raw events. Decimal
    partials make the two-level re-aggregation exactly equal to a
    direct daily aggregation (the oracle computes it directly)."""
    hourly = hourly_partials(events_batch(spark, sf_dir))
    return (
        hourly.groupBy(F.date_trunc("day", "hour_start").alias("day_start"), "event_type")
        .agg(F.sum("n_events").alias("n_events"),
             F.sum("sum_dec").cast("double").alias("sum_value"))
    )


ORACLE_EVENTS_ROLLUP_DAILY = """
SELECT time_bucket(INTERVAL '1 day', ts) AS day_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


# --- stream-stream interval join -------------------------------------------

ATTRIB_WINDOW_MIN = 30


def purchases_with_views(purchases: DataFrame, views: DataFrame,
                         watermark: str | None = None) -> DataFrame:
    """Attribution join: every (purchase, view) pair of the same user
    with the view at most 30 minutes before the purchase. ONE
    transformation for batch and streaming — pass ``watermark`` for the
    streaming application, where it (plus the two-sided time-range
    predicate) lets Spark evict join state: view-side rows older than
    purchase-watermark − 30 min can never match again and are dropped,
    so state is bounded regardless of stream length.

    Scale shape: both sides shuffle once on user_id; within a user the
    range predicate is evaluated on co-partitioned rows. A skewed user
    (bot traffic) is the known risk — the deterministic salted-join
    pattern (operators/sqlapi.py) is the escape hatch."""
    p = purchases.select(F.col("event_id").alias("purchase_id"), "user_id",
                         F.col("ts").alias("purchase_ts"),
                         F.col("value").alias("purchase_value"))
    v = views.select(F.col("user_id").alias("v_user_id"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"))
    if watermark:
        p = p.withWatermark("purchase_ts", watermark)
        v = v.withWatermark("view_ts", watermark)
    return p.join(
        v,
        (p.user_id == v.v_user_id)
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts")
           - F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")),
    ).select("purchase_id", "user_id", "purchase_ts", "purchase_value",
             "view_id", "view_ts")


def q_events_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_batch(spark, sf_dir)
    return purchases_with_views(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"))


ORACLE_EVENTS_STREAM_JOIN = f"""
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       p.value AS purchase_value,
       v.event_id AS view_id,
       v.ts AS view_ts
FROM events p
JOIN events v
  ON v.user_id = p.user_id
 AND p.event_type = 'purchase' AND v.event_type = 'view'
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL {ATTRIB_WINDOW_MIN} MINUTE
"""


# --- stream dedup (retry collapse) ------------------------------------------

# 30 minutes: wide enough that the sparse synthetic stream actually
# has same-key copies to collapse at every SF (1-minute buckets are
# collision-free there; production retry windows are seconds-to-minutes
# and the operator is bucket-size-agnostic).
DEDUP_BUCKET = "30 minutes"


def dedup_events_batch(events: DataFrame) -> DataFrame:
    """Retry/replay collapse: events of the same (user, type) within
    the same minute bucket are one logical action; keep the
    deterministic earliest ((ts, event_id)-min) and count the copies.
    One map-side-combined shuffle on the dedup key.

    Streaming twin: :func:`dedup_events_stream` —
    ``dropDuplicatesWithinWatermark`` on the same key, which keeps the
    FIRST ARRIVAL (arrival order, not event-time order) and evicts key
    state past the watermark; the batch form here is the deterministic
    ground truth on the same key set (the unit test pins key-set
    equality, not row identity)."""
    return (
        events.groupBy(F.window("ts", DEDUP_BUCKET).alias("w"), "user_id", "event_type")
        .agg(F.min(F.struct("ts", "event_id")).alias("first"),
             F.count(F.lit(1)).alias("n_copies"))
        .select(F.col("w.start").alias("bucket_start"), "user_id", "event_type",
                F.col("first.event_id").alias("keep_event_id"),
                F.col("first.ts").alias("first_ts"), "n_copies")
    )


def dedup_events_stream(events: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    """Streaming retry collapse: first arrival per (minute bucket,
    user, type) key; state bounded by watermark eviction."""
    keyed = events.withColumn("bucket_start", F.window("ts", DEDUP_BUCKET).start)
    return (keyed.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["bucket_start", "user_id", "event_type"])
            .select("bucket_start", "user_id", "event_type",
                    F.col("event_id").alias("keep_event_id"),
                    F.col("ts").alias("first_ts")))


def q_events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_events_batch(events_batch(spark, sf_dir))


ORACLE_EVENTS_STREAM_DEDUP = """
WITH keyed AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS bucket_start,
         user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY time_bucket(INTERVAL '30 minutes', ts), user_id, event_type
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY time_bucket(INTERVAL '30 minutes', ts), user_id, event_type) AS n_copies
  FROM events
)
SELECT bucket_start, user_id, event_type,
       event_id AS keep_event_id, ts AS first_ts, n_copies
FROM keyed WHERE rn = 1
"""


# --- per-window trending top-k ----------------------------------------------

TRENDING_K = 3


def trending_topk(events: DataFrame, size: str = "1 hour",
                  k: int = TRENDING_K) -> DataFrame:
    """Top-``k`` event types per tumbling window by count — the
    "what's trending each hour" rollup. Ties break by event_type so the
    result is total-ordered and oracle-stable.

    Plan: one map-side-combined count shuffle + a per-window window-rank
    over ≤ |types| rows per window (the rank input is the aggregate,
    never the raw events). Streaming path: the aggregation runs
    incrementally; the rank is applied per emitted micro-batch via
    ``foreachBatch`` (rank-over-agg isn't incrementalizable in append
    mode — the standard pattern for streaming top-k)."""
    counts = (events.groupBy(F.window("ts", size).alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n_events")))
    rk = Window.partitionBy("w").orderBy(F.desc("n_events"), F.asc("event_type"))
    return (counts.withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") <= k)
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", F.col("rk").cast("int").alias("rk")))


def q_events_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trending_topk(events_batch(spark, sf_dir))


ORACLE_EVENTS_TRENDING = f"""
WITH counts AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n_events, CAST(rk AS INT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY window_start
                                   ORDER BY n_events DESC, event_type ASC) AS rk
      FROM counts)
WHERE rk <= {TRENDING_K}
"""


QUERIES = {
    "events_stream_join": q_events_stream_join,
    "events_stream_dedup": q_events_stream_dedup,
    "events_trending": q_events_trending,
    "events_tumbling_counts": q_events_tumbling_counts,
    "events_sliding_avg": q_events_sliding_avg,
    "events_sessionization": q_events_sessionization,
    "events_enriched": q_events_enriched,
    "events_rollup_daily": q_events_rollup_daily,
}

ORACLES = {
    "events_stream_join": ORACLE_EVENTS_STREAM_JOIN,
    "events_stream_dedup": ORACLE_EVENTS_STREAM_DEDUP,
    "events_trending": ORACLE_EVENTS_TRENDING,
    "events_tumbling_counts": ORACLE_EVENTS_TUMBLING_COUNTS,
    "events_sliding_avg": ORACLE_EVENTS_SLIDING_AVG,
    "events_sessionization": ORACLE_EVENTS_SESSIONIZATION,
    "events_enriched": ORACLE_EVENTS_ENRICHED,
    "events_rollup_daily": ORACLE_EVENTS_ROLLUP_DAILY,
}
