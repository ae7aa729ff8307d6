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


# --- round-2 format additions ----------------------------------------------


def test_json_compact_each_row(spark, tmp_path):
    from pyspark.sql import types as T
    from clickhouse_23_3_19_32_lts_spark.sources.formats import read_json_compact_each_row

    p = tmp_path / "jc.jsonl"
    p.write_text('[1, "a", 1.5]\n[2, "b", 2.5]\n')
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    rows = read_json_compact_each_row(spark, str(p), schema).orderBy("id").collect()
    assert [(r["id"], r["s"], r["v"]) for r in rows] == [(1, "a", 1.5), (2, "b", 2.5)]


def test_tskv(spark, tmp_path):
    from pyspark.sql import types as T
    from clickhouse_23_3_19_32_lts_spark.sources.formats import read_tskv

    p = tmp_path / "t.tskv"
    p.write_text("id=1\tname=alpha\nid=2\tname=beta\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    rows = read_tskv(spark, str(p), schema).orderBy("id").collect()
    assert [(r["id"], r["name"]) for r in rows] == [(1, "alpha"), (2, "beta")]


def test_regexp_format(spark, tmp_path):
    from pyspark.sql import types as T
    from clickhouse_23_3_19_32_lts_spark.sources.formats import read_regexp

    p = tmp_path / "r.log"
    p.write_text("2024-01-01 GET /a\n2024-01-02 POST /b\n")
    schema = T.StructType(
        [
            T.StructField("d", T.DateType()),
            T.StructField("verb", T.StringType()),
            T.StructField("path", T.StringType()),
        ]
    )
    rows = (
        read_regexp(spark, str(p), schema, r"^(\S+) (\S+) (\S+)$").orderBy("d").collect()
    )
    assert str(rows[0]["d"]) == "2024-01-01" and rows[1]["verb"] == "POST"


def test_render_formats(spark):
    from clickhouse_23_3_19_32_lts_spark.sources.formats import render_format

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, s string").orderBy("id")
    pretty = render_format(df, "Pretty")
    assert "┌" in pretty and "│ id" in pretty and "│ 2 " in pretty
    md = render_format(df, "Markdown")
    assert md.splitlines()[0] == "| id | s |"
    vals = render_format(df, "Values")
    assert vals == "(1,'x'), (2,'y')"
    import json

    j = json.loads(render_format(df, "JSON"))
    assert j["rows"] == 2 and j["data"][0]["id"] == 1
    jc = json.loads(render_format(df, "JSONCompact"))
    assert jc["data"] == [[1, "x"], [2, "y"]]
    tskv = render_format(df, "TSKV")
    assert tskv.splitlines()[0] == "id=1\ts=x"
    xml = render_format(df, "XML")
    assert "<id>1</id>" in xml
    vert = render_format(df, "Vertical")
    assert "Row 1:" in vert and "id: 1" in vert


def test_table_function_url_file_and_view(spark, tmp_path):
    from clickhouse_23_3_19_32_lts_spark.sources import table_functions as TF

    p = tmp_path / "u.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    rows = TF.url(spark, f"file://{p}", "CSVWithNames").orderBy("a").collect()
    assert [(r["a"], r["b"]) for r in rows] == [(1, "x"), (2, "y")]

    v = TF.view(spark, "SELECT number, number * 2 AS d FROM numbers(3)").collect()
    assert [(r["number"], r["d"]) for r in v] == [(0, 0), (1, 2), (2, 4)]


def test_table_function_remote_resolves_catalog(spark, tmp_path):
    from clickhouse_23_3_19_32_lts_spark.sources import table_functions as TF

    spark.range(5).createOrReplaceTempView("remote_t")
    assert TF.remote(spark, "127.0.0.1:9000", "db.remote_t").count() == 5
    assert TF.cluster(spark, "main", "remote_t").count() == 5
    import pytest as _pt

    with _pt.raises(ValueError):
        TF.remote(spark, "127.0.0.1:9000", "nope_t")


def test_values_format_reader(spark, tmp_path):
    from pyspark.sql import types as T

    from clickhouse_23_3_19_32_lts_spark.sources.formats import read_values

    p = tmp_path / "v.values"
    p.write_text("(1, 'a, b', 2.5), (2, 'x\\'y', NULL),\n(3, 'z', 7)")
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("s", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    rows = read_values(spark, str(p), schema).orderBy("id").collect()
    assert [r.id for r in rows] == [1, 2, 3]
    assert rows[0].s == "a, b" and rows[1].s == "x'y"
    assert rows[1].v is None and rows[2].v == 7.0


def test_template_format_reader(spark, tmp_path):
    from pyspark.sql import types as T

    from clickhouse_23_3_19_32_lts_spark.sources.formats import read_template

    p = tmp_path / "t.txt"
    p.write_text("id=1; name=alpha\nid=2; name=beta\n")
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("name", T.StringType()),
        ]
    )
    rows = read_template(
        spark, str(p), schema, "id=${id:CSV}; name=${name:CSV}"
    ).orderBy("id").collect()
    assert [(r.id, r.name) for r in rows] == [(1, "alpha"), (2, "beta")]


def test_lakehouse_table_functions_surface(spark, tmp_path):
    """delta/iceberg need their runtime jars (absent here); the wrappers
    must fail with Spark's data-source error, not silently, and jdbc must
    build a reader without touching the network until load()."""
    import pytest

    from clickhouse_23_3_19_32_lts_spark.sources import table_functions as tf

    with pytest.raises(Exception, match="(?i)delta|not found|failed to find"):
        tf.deltalake(spark, str(tmp_path / "nope"))
    with pytest.raises(Exception):
        tf.iceberg(spark, str(tmp_path / "nope"))
    with pytest.raises(Exception, match="(?i)driver|class|url"):
        tf.mysql(spark, "localhost:0", "db", "t", "u", "p").limit(1).collect()
