"""Every registered query must hash-match its DuckDB oracle (driver's t2 gate,
run locally at sf0.001 for speed; the driver uses sf0.01)."""

from __future__ import annotations

import pytest

from clickhouse_23_3_19_32_lts_spark.queries import all_oracles, all_queries
from tests.oracle_check import assert_matches_oracle

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ORACLES[name])


def test_every_query_runs(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
