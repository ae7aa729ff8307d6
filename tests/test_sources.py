"""Sources/sinks tests: format round-trips, table functions, dictionaries."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from clickhouse_23_3_19_32_lts_spark.sources import (
    Dictionary,
    RangeHashedDictionary,
    generate_random,
    merge_tables,
    numbers,
    read_format,
    values_table,
    write_format,
    zeros,
)

PART_SCHEMA = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_retailprice", DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def part_df(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
        .limit(100)
    )


@pytest.mark.parametrize("fmt", ["CSVWithNames", "TSVWithNames", "JSONEachRow", "Parquet", "ORC"])
def test_format_roundtrip(spark, part_df, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_format(part_df, path, fmt)
    back = read_format(spark, path, fmt, schema=PART_SCHEMA)
    a = {(r["p_partkey"], r["p_name"], round(r["p_retailprice"], 6)) for r in part_df.collect()}
    b = {(r["p_partkey"], r["p_name"], round(r["p_retailprice"], 6)) for r in back.collect()}
    assert a == b


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        read_format(spark, "/nonexistent", "Pretty")


def test_numbers_and_zeros(spark):
    assert [r["number"] for r in numbers(spark, 5).collect()] == [0, 1, 2, 3, 4]
    assert [r["number"] for r in numbers(spark, 3, start=10).collect()] == [10, 11, 12]
    assert [r["zero"] for r in zeros(spark, 2).collect()] == [0, 0]
    # distributed: numbers() is a range source, not a driver materialization
    plan = numbers(spark, 10**9)._jdf.queryExecution().executedPlan().toString()
    assert "Range" in plan


def test_generate_random_deterministic(spark):
    schema = StructType(
        [StructField("a", LongType()), StructField("b", DoubleType()), StructField("s", StringType())]
    )
    x = generate_random(spark, schema, 10, seed=7).collect()
    y = generate_random(spark, schema, 10, seed=7).collect()
    z = generate_random(spark, schema, 10, seed=8).collect()
    assert x == y
    assert x != z
    assert all(isinstance(r["s"], str) and r["s"].startswith("s") for r in x)


def test_values_table(spark):
    df = values_table(spark, ["k", "v"], [(1, "a"), (2, "b")])
    assert {(r["k"], r["v"]) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_merge_tables(spark):
    t1 = spark.createDataFrame([Row(x=1)])
    t2 = spark.createDataFrame([Row(x=2, extra="e")])
    t3 = spark.createDataFrame([Row(x=3)])
    out = merge_tables({"log_a": t1, "log_b": t2, "other": t3}, "log_.*")
    rows = {(r["x"], r["_table"], r["extra"]) for r in out.collect()}
    assert rows == {(1, "log_a", None), (2, "log_b", "e")}
    with pytest.raises(ValueError):
        merge_tables({"t": t1}, "nope_.*")


def test_dictionary_get(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    d = Dictionary(nation, key="n_nationkey")
    out = d.get(supp, "s_nationkey", {"n_name": "UNKNOWN"})
    joined = {r["s_suppkey"]: r["n_name"] for r in out.collect()}
    direct = {
        r["s_suppkey"]: r["n_name"]
        for r in supp.join(nation, supp.s_nationkey == nation.n_nationkey).collect()
    }
    assert joined == direct  # all keys resolve in the fixture
    # broadcast plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dictionary_has_and_default(spark):
    dim = spark.createDataFrame([Row(id=1, name="one")])
    facts = spark.createDataFrame([Row(fid=1), Row(fid=99)])
    d = Dictionary(dim, key="id")
    got = {r["fid"]: r["name"] for r in d.get(facts, "fid", {"name": "dflt"}).collect()}
    assert got == {1: "one", 99: "dflt"}
    has = {r["fid"]: r["dict_has"] for r in d.has(facts, "fid").collect()}
    assert has == {1: True, 99: False}


def test_range_hashed_dictionary(spark):
    rates = spark.createDataFrame(
        [
            Row(cur="EUR", lo=0, hi=9, rate=1.0),
            Row(cur="EUR", lo=10, hi=19, rate=2.0),
            Row(cur="USD", lo=0, hi=99, rate=5.0),
        ]
    )
    txns = spark.createDataFrame(
        [Row(cur="EUR", day=5), Row(cur="EUR", day=15), Row(cur="USD", day=50), Row(cur="EUR", day=99)]
    )
    d = RangeHashedDictionary(rates, key="cur", range_start="lo", range_end="hi")
    got = {(r["cur"], r["day"]): r["rate"] for r in d.get(txns, "cur", "day", ["rate"]).collect()}
    assert got == {("EUR", 5): 1.0, ("EUR", 15): 2.0, ("USD", 50): 5.0, ("EUR", 99): None}
