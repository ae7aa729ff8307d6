"""dictGet* scalar family over the named-dictionary catalog."""

import pytest
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.functions import dictfns as D


@pytest.fixture(scope="module")
def nation_dict(spark):
    dim = spark.createDataFrame(
        [(0, "ALGERIA", 0), (1, "ARGENTINA", 1), (2, "BRAZIL", 1), (3, "CANADA", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    D.register_dictionary("nation_d", dim, key="n_nationkey")
    yield "nation_d"
    D.drop_dictionary("nation_d")


@pytest.fixture(scope="module")
def hier_dict(spark):
    # region tree: 1 -> 2 -> 4, 1 -> 3
    dim = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 1), (4, 2)], "id long, parent long"
    )
    D.register_dictionary("tree", dim, key="id", parent_attr="parent")
    yield "tree"
    D.drop_dictionary("tree")


def test_dictget_basic(spark, nation_dict):
    df = spark.createDataFrame([(1,), (3,), (99,)], "k long")
    rows = df.select(
        D.dictGet("nation_d", "n_name", F.col("k")).alias("name"),
        D.dictGetOrNull("nation_d", "n_name", F.col("k")).alias("name_n"),
        D.dictGetOrDefault("nation_d", "n_name", F.col("k"), "??").alias("name_d"),
        D.dictHas("nation_d", F.col("k")).alias("has"),
    ).orderBy("name").collect()
    by = {r["name_n"]: r for r in rows}
    assert by["ARGENTINA"]["has"] == 1 and by["CANADA"]["has"] == 1
    missing = by[None]
    assert missing["name"] == "" and missing["name_d"] == "??" and missing["has"] == 0


def test_dictget_typed(spark, nation_dict):
    df = spark.createDataFrame([(2,), (99,)], "k long")
    rows = df.select(
        D.dictGetString("nation_d", "n_name", F.col("k")).alias("s"),
        D.dictGetUInt64("nation_d", "n_regionkey", F.col("k")).alias("r"),
        D.dictGetFloat64("nation_d", "n_regionkey", F.col("k")).alias("f"),
    ).orderBy(F.desc("s")).collect()
    assert rows[0]["s"] == "BRAZIL" and rows[0]["r"] == 1 and rows[0]["f"] == 1.0
    assert rows[1]["s"] == "" and rows[1]["r"] == 0 and rows[1]["f"] == 0.0


def test_dict_hierarchy(spark, hier_dict):
    df = spark.createDataFrame([(4,), (3,), (1,)], "k long")
    rows = {
        r["k"]: r
        for r in df.select(
            "k",
            D.dictGetHierarchy("tree", F.col("k")).alias("h"),
            D.dictIsIn("tree", F.col("k"), F.lit(1)).alias("under1"),
            D.dictGetChildren("tree", F.col("k")).alias("ch"),
            D.dictGetDescendants("tree", F.col("k")).alias("desc"),
        ).collect()
    }
    assert rows[4]["h"] == [4, 2, 1] and rows[4]["under1"] == 1
    assert rows[3]["h"] == [3, 1]
    assert sorted(rows[1]["ch"]) == [2, 3]
    assert sorted(rows[1]["desc"]) == [2, 3, 4]
    assert rows[1]["under1"] == 1  # self counts: 1 is in its own hierarchy


def test_dict_registry_names():
    from clickhouse_23_3_19_32_lts_spark.functions.registry import REGISTRY

    for n in ("dictGetString", "dictGetUInt32OrDefault", "dictGetIPv4",
              "dictGetDateTime", "dictHas", "dictIsIn", "dictGetDescendants"):
        assert n in REGISTRY
