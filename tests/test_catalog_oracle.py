"""Every catalog query with an oracle must hash-match DuckDB (driver's t2 gate)."""

from __future__ import annotations

import pytest

from tests.oracle import compare
from universal_aws_data_pipeline_spark.plans.catalog import QUERIES

ORACLE_QUERIES = [name for name, spec in QUERIES.items() if spec.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    ok, msg = compare(spark, sf_dir, spec.fn, spec.oracle)
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows(spark, sf_dir):
    for name, spec in QUERIES.items():
        n = spec.fn(spark, sf_dir).count()
        assert n >= 0, name
