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

from collections.abc import Callable

from pyspark.sql import DataFrame

_SHARED: dict[tuple, DataFrame] = {}
_TRACKED: list[DataFrame] = []


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
        df = build().persist()
        _SHARED[k] = df
    return df


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
    return n
