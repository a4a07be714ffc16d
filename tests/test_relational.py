"""Relational core vs DuckDB oracle (same check the driver runs)."""

import pytest

from graphdatabase_spark.operators import relational

from tests.parity import assert_parity


@pytest.mark.parametrize("name", sorted(relational.ORACLES))
def test_relational_parity(spark, sf_dir, name):
    # iterate the ORACLES keys: rows-only entries (declared in
    # registry.ROWS_ONLY) have no SQL oracle and are accuracy-tested
    # against their exact counterparts instead.
    df = relational.QUERIES[name](spark, sf_dir)
    assert_parity(df, relational.ORACLES[name], sf_dir)


def test_segment_distinct_customers_approx_within_rsd(spark, sf_dir):
    """The HLL path must agree with the exact distinct counts within a
    generous multiple of the 1% rsd (the group cardinalities here are
    tiny, where HLL++ is exact or near-exact), and the non-sketch
    column must match exactly."""
    exact = {r["c_mktsegment"]: r for r in
             relational.q_segment_distinct_customers(spark, sf_dir).collect()}
    approx = {r["c_mktsegment"]: r for r in
              relational.q_segment_distinct_customers_approx(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for seg, e in exact.items():
        a = approx[seg]
        assert a["n_customers"] == e["n_customers"]
        assert abs(a["n_nations"] - e["n_nations"]) <= max(1, 0.05 * e["n_nations"])
