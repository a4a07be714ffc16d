"""Session-scoped shared-cache registry.

Several operator families reference the same expensive intermediate
(the shingle-hash inverted index, MinHash signatures, LSH-bucketed
embeddings) two or three times per query AND across queries in one
session. Persisting at each call site both duplicates the cache (four
text queries used to persist four copies of the same shingle index)
and leaks it — the consumer materializes the returned DataFrame after
the builder returns, so the builder can never unpersist.

This module centralizes both problems:

- :func:`shared_persist` memoizes by ``(applicationId, key)`` so every
  consumer in a session shares ONE persisted copy (materialize once,
  feed every consumer — the production pattern for a 100 TB shingle
  index).
- :func:`track_persist` persists anonymous intra-query temporaries and
  records them for release.
- :func:`release_caches` unpersists everything tracked. Call it from
  session teardown, bench epilogues, or any long-running service
  between workloads; re-running a query after release transparently
  rebuilds (and re-caches) what it needs.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame

_SHARED: dict[tuple, DataFrame] = {}
_TRACKED: list[DataFrame] = []

# Per-key build locks: concurrent materialization from driver threads
# (guide §2.6 — overlapping independent jobs, e.g. ann_recall's index
# builds) must not build the same key twice; a dependent build blocks
# on its dependency's lock and then reuses the memo.
_LOCKS: dict[tuple, threading.Lock] = {}
_META_LOCK = threading.Lock()


def _key_lock(k: tuple) -> threading.Lock:
    with _META_LOCK:
        lock = _LOCKS.get(k)
        if lock is None:
            lock = _LOCKS[k] = threading.Lock()
        return lock


def _app_id(df_or_spark) -> str:
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return spark.sparkContext.applicationId


def shared_persist(spark, key: tuple, build: Callable[[], DataFrame]) -> DataFrame:
    """Return the session-shared persisted DataFrame for ``key``,
    building it on first use. ``key`` must capture everything the plan
    depends on (sf_dir, parameters)."""
    k = (_app_id(spark), *key)
    df = _SHARED.get(k)
    if df is None:
        with _key_lock(k):
            df = _SHARED.get(k)
            if df is None:
                df = build().persist()
                _SHARED[k] = df
    return df


def shared_local(spark, key: tuple, build: Callable[[], DataFrame],
                 max_rows: int = 10_000) -> DataFrame:
    """Session-shared memo for METADATA-SIZED deterministic results
    (quantizer codebooks: tens to hundreds of rows): materialize
    ``build()`` once per (applicationId, key) and re-expose the rows
    as a LocalRelation-backed DataFrame.

    Why not :func:`shared_persist`: a persisted DataFrame's LOGICAL
    plan is still the full build tree — every consumer that embeds
    the codebook re-pays ANALYSIS over that tree, and the cache only
    collapses it at physical planning (measured: ann_recall's warm
    DataFrame BUILD cost 6.8 s vs 5.5 s execution with persist).
    A LocalRelation has no lineage at all: analysis is O(rows), the
    physical plan is a LocalTableScan that broadcasts for free. Same
    session-scoped semantics as shared_persist (computed from the
    parquet inputs once per process, released by
    :func:`release_caches`), with the driver holding only
    metadata-sized rows — ``max_rows`` is the loud guard that this
    never quietly becomes a driver-side data path (guide §5)."""
    k = (_app_id(spark), *key)
    df = _SHARED.get(k)
    if df is None:
        with _key_lock(k):
            df = _SHARED.get(k)
            if df is None:
                src = build()
                rows = src.collect()
                if len(rows) > max_rows:
                    raise ValueError(
                        f"shared_local({key}): {len(rows)} rows exceeds "
                        f"the metadata-size guard ({max_rows}); use "
                        f"shared_persist")
                df = spark.createDataFrame(rows, src.schema)
                _SHARED[k] = df
    return df


def shared_plan(spark, key: tuple, build: Callable[[], DataFrame]) -> DataFrame:
    """Session-shared memo of a DataFrame OBJECT — an *unexecuted
    plan*, never a result. First use pays ``build()`` (Python-side
    plan assembly + py4j round trips + analysis); later uses return
    the same object, so a warm call adds zero plan-construction cost.

    This is NOT a result cache: nothing is persisted and every action
    on the returned frame executes from the inputs. (Under AQE,
    re-executing the same physical plan can reuse the prior
    execution's shuffle files — Spark's ordinary skipped-stage
    behaviour for an identical RDD lineage, bounded to this session
    and dropped by :func:`release_caches` exactly like the shared
    index materializations.) Use for report plans whose *assembly*
    is measurably expensive (ann_recall: 9 probe legs, ~4 s of
    driver-side analysis per call)."""
    k = (_app_id(spark), *key)
    df = _SHARED.get(k)
    if df is None:
        with _key_lock(k):
            df = _SHARED.get(k)
            if df is None:
                df = build()
                _SHARED[k] = df
    return df


def is_cached(spark, key: tuple) -> bool:
    """True when ``key`` is already memoized for this session — lets
    cold-path warmers skip the memo hit + materialization probe
    entirely on warm calls."""
    return (_app_id(spark), *key) in _SHARED


def track_persist(df: DataFrame) -> DataFrame:
    """Persist an anonymous intermediate and record it for
    :func:`release_caches` (the call site can't unpersist it itself —
    its consumer materializes after the builder returns)."""
    _TRACKED.append(df.persist())
    return df


def release_caches() -> int:
    """Unpersist every shared and tracked DataFrame; returns how many
    were released. Safe to call with stopped sessions (failures from
    dead JVMs are swallowed — there is nothing left to unpersist)."""
    n = 0
    for df in list(_SHARED.values()) + _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    _SHARED.clear()
    _TRACKED.clear()
    # Keys embed applicationId, so locks from a stopped session can
    # never be reused — drop them or they accumulate across session
    # restarts within one process.
    with _META_LOCK:
        _LOCKS.clear()
    return n
