"""Local re-implementation of the driver's DuckDB-oracle parity check:
run a Spark query and its ANSI-SQL oracle over the same parquet, sort
columns by name and rows by value, and require exact equality.

Stricter than a hash compare — on mismatch it reports which column and
rows differ, which the driver's hash cannot.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            # DuckDB returns date columns as object(datetime.date); lists stay lists.
            sample = df[c].dropna()
            if len(sample) and hasattr(sample.iloc[0], "isoformat") and not isinstance(sample.iloc[0], str):
                df[c] = pd.to_datetime(df[c])
    sort_cols = [c for c in df.columns if df[c].dtype != object or not len(df) or not isinstance(df[c].dropna().iloc[0] if len(df[c].dropna()) else "", list)]
    df = df.sort_values(by=sort_cols, kind="mergesort", na_position="last").reset_index(drop=True)
    return df


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 0.0) -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(run_oracle(oracle_sql, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch:\n spark={list(got.columns)}\n oracle={list(want.columns)}")
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            both_nan = g.isna() & w.isna()
            if float_tol > 0:
                ok = both_nan | (g - w).abs().le(float_tol)
            else:
                ok = both_nan | (g == w)
        else:
            ok = (g.isna() & w.isna()) | (g == w)
        if not ok.all():
            bad = (~ok).to_numpy().nonzero()[0][:5]
            detail = "\n".join(f"  row {i}: spark={g.iloc[i]!r} oracle={w.iloc[i]!r}" for i in bad)
            raise AssertionError(f"value mismatch in column {c!r} ({(~ok).sum()} rows):\n{detail}")


def exact_match_fraction(got: pd.DataFrame, want: pd.DataFrame) -> float:
    """Diagnostic helper for float-sensitivity experiments."""
    if got.shape != want.shape:
        return 0.0
    eq = (got.values == want.values)
    return float(eq.mean()) if eq.size else 1.0
