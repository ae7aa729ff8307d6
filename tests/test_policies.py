"""Table-policy tests: MergeTree-family FINAL semantics, OPTIMIZE
compaction, mutations, TTL — on constructed tables small enough to verify
by hand."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.policies import (
    PolicyTable,
    collapsing_final,
    replacing_final,
    summing_final,
    ttl_filter,
    versioned_collapsing_final,
)


@pytest.fixture()
def table_path(tmp_path):
    return str(tmp_path / "tbl")


def test_replacing_final(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, v=10, ver=1),
            Row(k=1, v=20, ver=3),
            Row(k=1, v=15, ver=2),
            Row(k=2, v=5, ver=1),
        ]
    )
    got = {r["k"]: r["v"] for r in replacing_final(df, ["k"], "ver").collect()}
    assert got == {1: 20, 2: 5}  # max version wins


def test_summing_final(spark):
    df = spark.createDataFrame(
        [Row(k="a", n=1, x=10.0), Row(k="a", n=2, x=5.0), Row(k="b", n=7, x=1.0)]
    )
    got = {r["k"]: (r["n"], r["x"]) for r in summing_final(df, ["k"]).collect()}
    assert got == {"a": (3, 15.0), "b": (7, 1.0)}


def test_collapsing_final(spark):
    # deterministic pick among surviving +1 rows = max by non-key columns
    # (insertion order is not recoverable from parquet; v2 > v1 stands in)
    df = spark.createDataFrame(
        [
            Row(k=1, state="v1", sign=1),
            Row(k=1, state="v1", sign=-1),  # cancels
            Row(k=1, state="v2", sign=1),   # survives
            Row(k=2, state="gone", sign=1),
            Row(k=2, state="gone", sign=-1),  # fully cancelled
        ]
    )
    rows = collapsing_final(df, ["k"], "sign").collect()
    assert {(r["k"], r["state"]) for r in rows} == {(1, "v2")}


def test_versioned_collapsing_final(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, v="a", sign=1, ver=1),
            Row(k=1, v="a", sign=-1, ver=2),  # latest is a delete
            Row(k=2, v="b", sign=1, ver=5),   # latest is an insert
        ]
    )
    rows = versioned_collapsing_final(df, ["k"], "sign", "ver").collect()
    assert {(r["k"], r["v"]) for r in rows} == {(2, "b")}


def test_ttl_filter(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [Row(ts=datetime(2024, 1, 1), v=1), Row(ts=datetime(2024, 6, 1), v=2)]
    )
    kept = ttl_filter(df, "ts", F.lit("2024-03-01").cast("timestamp")).collect()
    assert [r["v"] for r in kept] == [2]


def test_policy_table_insert_final_optimize(spark, table_path):
    t = PolicyTable(
        spark, table_path, order_by=["k"], policy="replacing", keys=["k"], version="ver"
    )
    t.insert(spark.createDataFrame([Row(k=1, v="first", ver=1), Row(k=2, v="x", ver=1)]))
    t.insert(spark.createDataFrame([Row(k=1, v="second", ver=2)]))

    assert t.read().count() == 3  # raw read sees duplicates (pre-merge)
    got = {r["k"]: r["v"] for r in t.final().collect()}
    assert got == {1: "second", 2: "x"}

    t.optimize()
    assert t.read().count() == 2  # compaction materialized FINAL
    got2 = {r["k"]: r["v"] for r in t.final().collect()}
    assert got2 == got


def test_policy_table_mutations(spark, table_path):
    t = PolicyTable(spark, table_path, order_by=["k"])
    t.insert(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(10)]))

    t.delete_where(F.col("k") >= 8)
    assert t.read().count() == 8

    t.update_where(F.col("k") < 2, {"v": F.col("v") + 100})
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[0] == 100.0 and got[1] == 101.0 and got[5] == 5.0


def test_policy_table_partitioned_writes(spark, table_path):
    t = PolicyTable(spark, table_path, order_by=["v"], partition_by=["p"])
    t.insert(spark.createDataFrame([Row(p="a", v=1), Row(p="b", v=2)]))
    t.insert(spark.createDataFrame([Row(p="a", v=3)]))
    import os

    assert sorted(d for d in os.listdir(table_path) if d.startswith("p=")) == ["p=a", "p=b"]
    # partition-pruned read plan: only p=a files scanned
    plan = t.read().filter(F.col("p") == "a")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in plan
    assert t.read().filter(F.col("p") == "a").count() == 2


def test_check_constraints_and_defaults(spark, table_path):
    from pyspark.sql import Row

    t = PolicyTable(
        spark,
        table_path,
        constraints={"positive_v": F.col("v") > 0},
        defaults={"status": "new"},
    )
    t.insert(spark.createDataFrame([Row(k=1, v=5, status=None), Row(k=2, v=1, status="old")]))
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got == {1: "new", 2: "old"}  # NULL filled with default

    with pytest.raises(ValueError, match="positive_v"):
        t.insert(spark.createDataFrame([Row(k=3, v=-1, status="x")]))
    assert t.read().count() == 2  # rejected insert wrote nothing


def test_partition_pruned_mutation(spark, table_path):
    """delete_where with a partition predicate rewrites only the touched
    partitions (dynamic overwrite); other partitions' files stay intact."""
    import os

    t = PolicyTable(spark, table_path, partition_by=["p"])
    t.insert(spark.createDataFrame([Row(p="a", v=i) for i in range(4)]
                                   + [Row(p="b", v=i) for i in range(4)]))
    b_files_before = set(os.listdir(os.path.join(table_path, "p=b")))

    t.delete_where(F.col("v") >= 2, partition_predicate=F.col("p") == "a")
    got = sorted((r["p"], r["v"]) for r in t.read().collect())
    assert got == [("a", 0), ("a", 1), ("b", 0), ("b", 1), ("b", 2), ("b", 3)]
    # p=b untouched: same files on disk
    assert set(os.listdir(os.path.join(table_path, "p=b"))) == b_files_before
