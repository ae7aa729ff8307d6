"""Tests for the mechanical name families in functions/variants.py:
conversion OrZero/OrNull/OrDefault, parseDateTime*, sub-second arithmetic,
multiSearch* tail, scalar minhash/simhash sketches."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark import functions as CH
from clickhouse_23_3_19_32_lts_spark.functions.registry import REGISTRY


def one(spark, col, **row):
    df = spark.createDataFrame([row or {"dummy": 1}])
    return df.select(col.alias("v")).collect()[0]["v"]


def test_registry_size_after_variants():
    assert len(REGISTRY) >= 950, len(REGISTRY)


def test_conversion_or_variants(spark):
    assert one(spark, CH.toUInt32OrZero(F.lit("abc"))) == 0
    assert one(spark, CH.toUInt32OrZero(F.lit("123"))) == 123
    assert one(spark, CH.toInt64OrNull(F.lit("abc"))) is None
    assert one(spark, CH.toFloat64OrDefault(F.lit("abc"), F.lit(9.5))) == 9.5
    assert one(spark, CH.toFloat64OrDefault(F.lit("2.5"), F.lit(9.5))) == 2.5
    assert one(spark, CH.toDateOrZero(F.lit("xx"))) == datetime.date(1970, 1, 1)
    assert one(spark, CH.toDateOrNull(F.lit("2024-05-05"))) == datetime.date(2024, 5, 5)
    # Spark decimal cast rounds (half-up) — matches the repo's toDecimal64
    assert str(one(spark, CH.toDecimal64OrNull(F.lit("12.345"), 2))) == "12.35"
    assert one(spark, CH.toDecimal64OrNull(F.lit("nope"), 2)) is None
    assert one(spark, CH.toUUIDOrZero(F.lit("nope"))) == "00000000-0000-0000-0000-000000000000"
    # wide ints: DECIMAL(38,0) keeps 27-digit exactness
    assert str(one(spark, CH.toInt128(F.lit("123456789012345678901234567")))) == (
        "123456789012345678901234567"
    )
    assert one(spark, CH.toBool(F.lit("yes"))) is True
    assert one(spark, CH.toBool(F.lit("0"))) is False
    assert one(spark, CH.toDecimalString(F.lit(2 / 3), 6)) == "0.666667"


def test_parse_datetime_variants(spark):
    epoch = datetime.datetime(1970, 1, 1, 0, 0)
    assert one(spark, CH.parseDateTimeBestEffortOrZero(F.lit("definitely not"))) == epoch
    assert one(spark, CH.parseDateTime64BestEffortOrNull(F.lit("zzz"))) is None
    got = one(spark, CH.parseDateTimeInJodaSyntax(F.lit("2024-01-02 03:04:05"), "yyyy-MM-dd HH:mm:ss"))
    assert got == datetime.datetime(2024, 1, 2, 3, 4, 5)
    # unix-seconds string parses as a number (BestEffort rule)
    got = one(spark, CH.parseDateTimeBestEffortUS(F.lit("1700000000")))
    assert got == datetime.datetime(2023, 11, 14, 22, 13, 20)
    assert one(spark, CH.parseTimeDelta(F.lit("1h 30m 10s"))) == 5410.0


def test_datetime_arithmetic_variants(spark):
    d = F.lit("2024-01-15").cast("date")
    assert one(spark, CH.addQuarters(d, F.lit(2))) == datetime.date(2024, 7, 15)
    assert one(spark, CH.subtractQuarters(d, F.lit(1))) == datetime.date(2023, 10, 15)
    ts = F.lit("2024-03-15 10:30:45.123456").cast("timestamp")
    assert one(spark, CH.addMilliseconds(ts, F.lit(500))) == datetime.datetime(
        2024, 3, 15, 10, 30, 45, 623456
    )
    assert one(spark, CH.addMicroseconds(ts, F.lit(7))) == datetime.datetime(
        2024, 3, 15, 10, 30, 45, 123463
    )
    assert one(spark, CH.toStartOfFiveMinute(ts)) == datetime.datetime(2024, 3, 15, 10, 30)
    assert one(spark, CH.toStartOfMillisecond(ts)) == datetime.datetime(
        2024, 3, 15, 10, 30, 45, 123000
    )
    # ISO year of 2021-01-01 is 2020; ISO year 2020 starts Mon 2019-12-30
    assert one(spark, CH.toStartOfISOYear(F.lit("2021-01-01"))) == datetime.date(2019, 12, 30)
    assert one(spark, CH.toRelativeQuarterNum(F.lit("2024-05-05"))) == 2024 * 4 + 1
    assert one(spark, CH.toYearWeek(F.lit("2024-05-05"))) == 202418
    assert one(spark, CH.toUnixTimestamp64Milli(ts)) == 1710498645123
    assert one(spark, CH.fromUnixTimestamp64Milli(F.lit(1700000000123))) == (
        datetime.datetime(2023, 11, 14, 22, 13, 20, 123000)
    )
    # snowflake epoch round-trip
    sf = one(spark, CH.dateTime64ToSnowflake(F.lit("2022-02-24 15:36:08.405").cast("timestamp")))
    back = one(spark, CH.snowflakeToDateTime64(F.lit(sf)))
    assert back == datetime.datetime(2022, 2, 24, 15, 36, 8, 405000)


def test_multisearch_tail(spark):
    s = F.lit("hello world")
    pats = F.array(F.lit("world"), F.lit("zzz"))
    assert one(spark, CH.multiSearchAllPositions(s, pats)) == [7, 0]
    assert one(spark, CH.multiSearchFirstIndex(s, F.array(F.lit("zz"), F.lit("wor")))) == 2
    assert one(spark, CH.multiSearchFirstPosition(s, F.array(F.lit("world"), F.lit("ello")))) == 2
    assert one(spark, CH.multiSearchFirstIndex(s, F.array(F.lit("x"), F.lit("y")))) == 0
    assert one(spark, CH.multiMatchAllIndices(s, F.array(F.lit("h.*o"), F.lit("^z")))) == [1]
    assert one(
        spark,
        CH.multiSearchAllPositionsCaseInsensitive(s, F.array(F.lit("WORLD"))),
    ) == [7]


def test_string_tail(spark):
    assert one(spark, CH.regexpQuoteMeta(F.lit("a.b*c"))) == "a\\.b\\*c"
    assert one(spark, CH.splitByNonAlpha(F.lit("foo, bar!! baz"))) == ["foo", "bar", "baz"]
    assert one(spark, CH.encodeXMLComponent(F.lit("<a&b>"))) == "&lt;a&amp;b&gt;"
    assert one(spark, CH.decodeXMLComponent(F.lit("&lt;a&amp;b&gt;"))) == "<a&b>"
    assert one(spark, CH.encodeURLFormComponent(F.lit("a b&c"))) == "a+b%26c"
    assert one(spark, CH.decodeURLFormComponent(F.lit("a+b%26c"))) == "a b&c"
    assert (
        one(spark, CH.extractTextFromHTML(F.lit("<p>Hi <b>there</b></p><script>x=1</script>")))
        == "Hi there"
    )
    assert one(spark, CH.toStringCutToZero(F.lit("ab\x00cd"))) == "ab"


def test_scalar_sketches_deterministic(spark):
    # same input → same sketch; near-identical inputs → close simhash
    a1 = one(spark, CH.ngramMinHash(F.lit("the quick brown fox")))
    a2 = one(spark, CH.ngramMinHash(F.lit("the quick brown fox")))
    assert a1 == a2 and a1["_1"] <= a1["_2"]
    w = one(spark, CH.wordShingleMinHashArg(F.lit("the quick brown fox jumps over"), 2))
    assert w["_1"].count(" ") == 1  # 2-word shingle
    s1 = one(spark, CH.ngramSimHash(F.lit("abcdefghijklmnop")))
    s2 = one(spark, CH.ngramSimHash(F.lit("abcdefghijklmnoq")))
    diff = bin(s1 ^ s2).count("1")
    assert diff <= 8  # near-dup strings stay close in hamming space
    assert one(
        spark,
        CH.tupleHammingDistance(
            F.struct(F.lit(1).alias("_1"), F.lit(2).alias("_2")),
            F.struct(F.lit(1).alias("_1"), F.lit(3).alias("_2")),
        ),
    ) == 1
