"""Every registered query must exactly match its DuckDB oracle."""

from __future__ import annotations

import pytest

from simple_etl_spark import queries as q
from tests.oracle_harness import compare, duck_connection


def _specs():
    q._load_all()
    return [s for s in q.REGISTRY.values() if s.oracle is not None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_query_matches_oracle(spec, spark, sf_dir, duck):
    df = spec.fn(spark, sf_dir)
    ok, msg = compare(df, duck, spec.oracle)
    assert ok, f"{spec.name}: {msg}"


def test_rows_only_queries_run(spark, sf_dir):
    q._load_all()
    for spec in q.REGISTRY.values():
        if spec.oracle is None:
            assert spec.fn(spark, sf_dir).count() >= 0, spec.name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0
