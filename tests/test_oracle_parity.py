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


def test_resolve_consumers_depend_on_independent_resolve_oracle(spark, sf_dir):
    """ADVICE r5: q_dedup_cluster_stats / q_dedup_rate_by_source /
    q_split_by_cluster oracles read Spark's STAGED resolve table, so
    their greens are conditional on q_dedup_resolve's own oracle — the
    INDEPENDENT recursive-CTE fixpoint — being green on the same staged
    bytes. This combined check enforces that ordering explicitly:
    resolve's independent re-derivation first, then the three consumers
    (cheap: resolved_clusters memoizes, so no pipeline re-runs)."""
    for name in (
        "q_dedup_resolve",
        "q_dedup_cluster_stats",
        "q_dedup_rate_by_source",
        "q_split_by_cluster",
    ):
        compare_query(spark, sf_dir, QUERIES[name], ORACLES[name])
