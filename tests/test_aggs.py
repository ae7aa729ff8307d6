"""Unit tests for aggregate-family queries that register without an oracle
(sketch-based, engine-specific) — bound their error vs exact instead."""

from __future__ import annotations


def test_uniq_approx_relative_error(spark, sf_dir):
    from clickhouse_23_3_19_32_lts_spark.queries import all_queries

    rows = all_queries()["q_uniq_approx"](spark, sf_dir).collect()
    assert rows, "no groups"
    for r in rows:
        exact, approx = r["exact_orders"], r["approx_orders"]
        assert exact > 0
        # approx_count_distinct default rsd = 0.05; allow 3 sigma
        assert abs(approx - exact) / exact <= 0.15, r
