"""Relational core vs DuckDB oracle (same check the driver runs)."""

import pytest

from graphdatabase_spark.operators import relational

from tests.parity import assert_parity


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_parity(spark, sf_dir, name):
    df = relational.QUERIES[name](spark, sf_dir)
    assert_parity(df, relational.ORACLES[name], sf_dir)
