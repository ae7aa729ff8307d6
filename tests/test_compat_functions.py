"""Long-tail function surface (functions/compat.py): every family executed
against hand-computable fixtures or Spark built-in equivalents."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark import functions as CH


@pytest.fixture(scope="module")
def tagged(spark):
    rows = [(i % 5, float(i % 7), i % 2, ["a", "b"][i % 2], float(i)) for i in range(100)]
    return spark.createDataFrame(rows, "g int, v double, tag int, cat string, x double")


def test_sql_compat_aliases(spark, tagged):
    r = tagged.agg(
        CH.BIT_AND("g").alias("ba"),
        CH.BIT_OR("g").alias("bo"),
        CH.STDDEV_POP("v").alias("sp"),
        CH.VAR_SAMP("v").alias("vs"),
        CH.COVAR_POP("v", "x").alias("cp"),
        CH.corrStable("v", "x").alias("cs"),
    ).first()
    w = tagged.agg(
        F.bit_and("g"), F.bit_or("g"), F.stddev_pop("v"), F.var_samp("v"),
        F.covar_pop("v", "x"), F.corr("v", "x"),
    ).first()
    for a, b in zip(r, w):
        assert a == pytest.approx(b)


def test_scalar_compat(spark):
    r = spark.range(1).select(
        CH.LAST_DAY(F.lit("2024-02-10").cast("date")).alias("ld"),
        CH.instr(F.lit("hello world"), "world").alias("pos"),
        CH.width_bucket(F.lit(5.5), F.lit(0.0), F.lit(10.0), F.lit(5)).alias("wb"),
        CH.str_to_date(F.lit("2024-03-01"), "%Y-%m-%d").alias("sd"),
        CH.snowflakeToDateTime(F.lit(1426981191219605504)).alias("snow"),
        CH.timeZone().alias("tz"),
    ).first()
    assert str(r["ld"]) == "2024-02-29"
    assert r["pos"] == 7
    assert r["wb"] == 3
    assert str(r["sd"]) == "2024-03-01"
    assert r["snow"].year == 2021
    assert r["tz"] == "UTC"


def test_snowflake_roundtrip(spark):
    r = spark.sql("SELECT timestamp'2022-05-01 10:00:00' AS ts").select(
        CH.snowflakeToDateTime(CH.dateTimeToSnowflake("ts")).alias("rt"), "ts"
    ).first()
    assert r["rt"] == r["ts"]


def test_weighted_median(spark):
    df = spark.createDataFrame([(1.0, 1), (2.0, 1), (3.0, 8)], "v double, w int")
    r = df.agg(
        CH.medianExactWeighted("v", "w").alias("mw"),
        CH.medianExact("v").alias("m"),
    ).first()
    assert r["mw"] == 3.0  # weight 8 dominates
    assert r["m"] == 2.0


def test_any_heavy_and_single_value(spark):
    df = spark.createDataFrame([(1,), (2,), (2,), (2,), (3,)], "v int")
    assert df.agg(CH.anyHeavy("v")).first()[0] == 2
    assert df.agg(CH.singleValueOrNull("v")).first()[0] is None
    one = spark.createDataFrame([(7,), (7,)], "v int")
    assert one.agg(CH.singleValueOrNull("v")).first()[0] == 7


def test_sum_map_family(spark):
    df = spark.createDataFrame(
        [(["a", "b"], [1.0, 2.0]), (["b", "c"], [3.0, 4.0])], "k array<string>, v array<double>"
    )
    r = df.agg(CH.sumMap("k", "v").alias("sm"), CH.minMap("k", "v").alias("mn"),
               CH.maxMap("k", "v").alias("mx")).first()
    assert r["sm"]["keys"] == ["a", "b", "c"] and r["sm"]["values"] == [1.0, 5.0, 4.0]
    assert r["mn"]["values"] == [1.0, 2.0, 4.0]
    assert r["mx"]["values"] == [1.0, 3.0, 4.0]
    rf = df.agg(CH.sumMapFiltered("k", "v", ["b"]).alias("f")).first()["f"]
    assert rf["keys"] == ["b"] and rf["values"] == [5.0]


def test_student_t_and_z(spark):
    import random

    random.seed(7)
    rows = [(random.gauss(0.0, 1.0), 0) for _ in range(200)] + [
        (random.gauss(1.0, 1.0), 1) for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "v double, tag int")
    t = df.agg(CH.studentTTest("v", "tag").alias("t")).first()["t"]
    z = df.agg(CH.meanZTest("v", "tag").alias("z")).first()["z"]
    assert t["_1"] < -5 and t["_2"] < 1e-6  # clearly separated means
    assert z["_1"] < -5 and z["_2"] < 1e-6


def test_sparkbar(spark):
    df = spark.createDataFrame([(float(i), float(i)) for i in range(8)], "x double, y double")
    bar = df.agg(CH.sparkbar("x", "y", 8).alias("b")).first()["b"]
    assert len(bar) == 8
    assert bar[0] == "▁" and bar[-1] == "█"
    flat = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, y double")
    b2 = flat.agg(CH.sparkbar("x", "y", 4).alias("b")).first()["b"]
    assert b2[0] == "█" and b2[-1] == "█"


def test_categorical_iv(spark, tagged):
    iv = tagged.agg(CH.categoricalInformationValue("cat", "tag").alias("iv")).first()["iv"]
    # cat == ['a','b'][i%2] and tag == i%2 are perfectly correlated... but both
    # cells are nonzero only when a category has good AND bad rows; here 'a'
    # has only tag 0 and 'b' only tag 1, so both contribute 0 by the
    # zero-cell rule
    assert iv == 0.0
    mixed = spark.createDataFrame(
        [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)] * 3 + [("b", 0)] * 7, "cat string, tag int"
    )
    iv2 = mixed.agg(CH.categoricalInformationValue("cat", "tag").alias("iv")).first()["iv"]
    g_a, b_a, g_b, b_b, G, B = 8, 2, 3, 7, 11, 9
    want = (g_a / G - b_a / B) * math.log((g_a / G) / (b_a / B)) + (
        g_b / G - b_b / B
    ) * math.log((g_b / G) / (b_b / B))
    assert iv2 == pytest.approx(want)


def test_sequence_next_node(spark):
    rows = [
        (1, 1.0, "login"), (1, 2.0, "search"), (1, 3.0, "buy"), (1, 4.0, "logout"),
        (2, 1.0, "login"), (2, 2.0, "buy"),
        (3, 1.0, "search"), (3, 2.0, "search"),
    ]
    df = spark.createDataFrame(rows, "u int, ts double, ev string")
    r = {
        x["u"]: x["nxt"]
        for x in df.groupBy("u").agg(CH.sequenceNextNode("ts", "ev", "login", "search").alias("nxt")).collect()
    }
    assert r == {1: "buy", 2: None, 3: None}
    r2 = {
        x["u"]: x["nxt"]
        for x in df.groupBy("u").agg(CH.sequenceNextNode("ts", "ev", "login").alias("nxt")).collect()
    }
    assert r2 == {1: "search", 2: "buy", 3: None}


def test_vector_norm_aliases(spark):
    df = spark.createDataFrame([([3.0, 4.0], [0.0, 0.0])], "a array<double>, b array<double>")
    r = df.select(
        CH.REGISTRY["normL2"]("a").alias("n2"),
        CH.REGISTRY["distanceL2"]("a", "b").alias("d2"),
        CH.REGISTRY["normL1"]("a").alias("n1"),
    ).first()
    assert r["n2"] == pytest.approx(5.0)
    assert r["d2"] == pytest.approx(5.0)
    assert r["n1"] == pytest.approx(7.0)


def test_uniq_theta_contract(spark):
    df = spark.range(0, 10000).selectExpr("id % 997 AS v")
    est = df.agg(CH.uniqTheta("v")).first()[0]
    assert abs(est - 997) / 997 < 0.05
