"""SQL-text surface vs DuckDB oracle (same check the driver runs)."""

import pytest

from graphdatabase_spark.operators import sqlapi

from tests.parity import assert_parity


@pytest.mark.parametrize("name", sorted(sqlapi.QUERIES))
def test_sqlapi_parity(spark, sf_dir, name):
    assert_parity(sqlapi.QUERIES[name](spark, sf_dir), sqlapi.ORACLES[name], sf_dir)
