"""Unit tests for aggregate-family queries that register without an oracle
(sketch-based, engine-specific) — bound their error vs exact instead."""

from __future__ import annotations


def test_uniq_approx_relative_error(spark, sf_dir):
    from clickhouse_23_3_19_32_lts_spark.queries import all_queries

    rows = all_queries()["q_uniq_approx"](spark, sf_dir).collect()
    assert rows, "no groups"
    for r in rows:
        # the query is self-verifying: it computes both the HLL estimate and
        # the exact count in-plan and returns the bound check as a boolean
        # (oracle side emits the same exact count with a literal TRUE)
        assert r["exact_orders"] > 0
        assert r["within_5pct"] is True, r


def test_aggregate_builders(spark):
    """CH.* aggregate builders (functions/aggregates.py) against DuckDB-
    known values on a literal frame."""
    from pyspark.sql import functions as F

    from clickhouse_23_3_19_32_lts_spark import functions as CH

    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 30.0), (2, 5.0)], ["k", "v"]
    )
    row = (
        df.groupBy("k")
        .agg(
            CH.quantile("v", 0.5).alias("med"),
            CH.uniqExact("v").alias("ue"),
            CH.argMax("v", "v").alias("am"),
            CH.sumIf("v", F.col("v") > 10).alias("si"),
            CH.avgWeighted("v", "v").alias("aw"),
            CH.skewSamp("v").alias("ss"),
        )
        .filter("k = 1")
        .collect()[0]
    )
    assert row["med"] == 20.0
    assert row["ue"] == 3
    assert row["am"] == 30.0
    assert row["si"] == 50.0
    assert abs(row["aw"] - (100 + 400 + 900) / 60) < 1e-9
    assert abs(row["ss"]) < 1e-9  # symmetric sample => 0 skew
