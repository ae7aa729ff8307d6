"""Round-2 tail batch: bitmap subset ops, ngramSearch, IP conversions,
array reverse/ranges, custom TLD, geohashesInBox, state helpers."""

import pytest
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.functions import variants3 as V


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_bitmap_tail(spark):
    bm = F.array(F.lit(3), F.lit(1), F.lit(7), F.lit(5))
    b = F.array_sort(F.array_distinct(bm))
    other = F.array(F.lit(5), F.lit(9))
    assert _one(spark, V.bitmapMin(b)) == 1
    assert _one(spark, V.bitmapMax(b)) == 7
    assert _one(spark, V.bitmapMin(F.array().cast("array<long>"))) == 4294967295
    assert _one(spark, V.bitmapXorCardinality(b, other)) == 4  # {1,3,7,9}
    assert _one(spark, V.bitmapAndnotCardinality(b, other)) == 3  # {1,3,7}
    assert _one(spark, V.bitmapSubsetInRange(b, 3, 7)) == [3, 5]
    assert _one(spark, V.bitmapSubsetLimit(b, 3, 2)) == [3, 5]
    assert _one(spark, V.subBitmap(b, 1, 2)) == [3, 5]
    assert _one(
        spark,
        V.bitmapTransform(b, F.array(F.lit(3), F.lit(7)), F.array(F.lit(30), F.lit(70))),
    ) == [1, 5, 30, 70]


def test_ngram_search(spark):
    v = _one(spark, V.ngramSearch(F.lit("abcdefgh"), F.lit("abcdef")))
    assert v == 1.0  # every needle 4-gram is in the haystack
    v2 = _one(spark, V.ngramSearch(F.lit("abcdefgh"), F.lit("abcdxy")))
    assert 0.0 < v2 < 1.0
    assert _one(spark, V.ngramSearchCaseInsensitive(F.lit("ABCDEF"), F.lit("abcdef"))) == 1.0
    assert _one(spark, V.multiMatchAny(F.lit("hello world"), ["^x", "wor.d$"])) == 1


def test_ip_conversions(spark):
    assert _one(spark, V.toIPv4OrNull(F.lit("1.2.3.4"))) == "1.2.3.4"
    assert _one(spark, V.toIPv4OrNull(F.lit("nope"))) is None
    assert _one(spark, V.toIPv4OrZero(F.lit("nope"))) == "0.0.0.0"
    assert _one(spark, V.toIPv4OrDefault(F.lit("nope"), "9.9.9.9")) == "9.9.9.9"
    assert _one(spark, V.toIPv6OrZero(F.lit("::1"))) == "::1"
    assert _one(spark, V.toIPv6OrZero(F.lit("zzz"))) == "::"


def test_array_tail(spark):
    arr = F.array(*[F.lit(x) for x in [1, 2, 3, 4, 5]])
    got = _one(spark, V.arrayReverseSplit(lambda x: x % 2 == 0, arr))
    assert got == [[1, 2], [3, 4], [5]]
    # ends exactly at the last element
    arr2 = F.array(*[F.lit(x) for x in [1, 2]])
    assert _one(spark, V.arrayReverseSplit(lambda x: x == 2, arr2)) == [[1, 2]]
    ranges = F.array(
        F.struct(F.lit(1).alias("_1"), F.lit(3).alias("_2")),
        F.struct(F.lit(3).alias("_1"), F.lit(2).alias("_2")),
    )
    assert _one(spark, V.arrayReduceInRanges("sum", ranges, arr)) == [6, 7]
    assert _one(spark, V.arrayEnumerateUniqRanked(F.array(F.lit(10), F.lit(10), F.lit(20)))) == [1, 2, 1]


def test_custom_tld(spark):
    V.register_tld_list("mylist", ["co.uk", "com"])
    url = F.lit("https://www.sub.example.co.uk/path")
    assert _one(spark, V.cutToFirstSignificantSubdomainCustom(url, "mylist")) == "example.co.uk"
    assert _one(spark, V.firstSignificantSubdomainCustom(url, "mylist")) == "example"
    url2 = F.lit("http://shop.example.com/x")
    assert _one(spark, V.cutToFirstSignificantSubdomainCustom(url2, "mylist")) == "example.com"


def test_geohashes_in_box(spark):
    got = _one(spark, V.geohashesInBox(F.lit(-0.2), F.lit(51.4), F.lit(0.2), F.lit(51.6), 3))
    assert isinstance(got, list) and len(got) > 0
    assert all(len(g) == 3 for g in got)
    # box around greenwich includes gcp (London area at precision 3)
    assert any(g.startswith("gcp") or g.startswith("u10") for g in got)


def test_state_helpers(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    st = df.agg(
        F.struct(F.sum("x").alias("sum"), F.count("x").alias("cnt")).alias("avg_state")
    )
    got = st.select(V.finalizeAggregation(F.col("avg_state"), "avg").alias("m")).first()["m"]
    assert got == 2.0
    assert _one(spark, V.initializeAggregation("sumState", 5)) == 5
    assert _one(spark, V.initializeAggregation("avgState", 4.0)).asDict() == {"sum": 4.0, "cnt": 1}
    assert _one(spark, V.indexHint(F.lit("anything"))) == 1
    assert _one(spark, V.defaultValueOfTypeName("UInt32")) == 0
    assert _one(spark, V.accurateCastOrDefault(F.lit("xx"), "Int64", 7)) == 7


def test_random_tail(spark):
    assert len(_one(spark, V.randomStringUTF8(5))) == 5
    v = _one(spark, V.randConstant())
    assert 0 <= v < 2**32
    with pytest.raises(ValueError):
        V.groupArrayMovingSum("x")
