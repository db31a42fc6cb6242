"""t2 gate, locally: every oracled query must match DuckDB at sf0.01;
every rows-only query must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from dateng_data_lakes_apache_spark_spark.registry import get_oracles, get_queries

from .parity import compare_query

QUERIES = get_queries()
ORACLES = get_oracles()

ORACLED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_dir, name):
    compare_query(spark, sf_dir, QUERIES[name], ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    rows = df.count()
    assert rows >= 0
    assert len(df.columns) > 0
